# forge3d_tpu/provenance.py — reference-parity import alias.
# The reference exposes this as python/forge3d/provenance.py; the
# implementation lives at forge3d_tpu.assurance.provenance (VERITAS provenance seals).

from forge3d_tpu.assurance.provenance import *  # noqa: F401,F403
from forge3d_tpu.assurance.provenance import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
