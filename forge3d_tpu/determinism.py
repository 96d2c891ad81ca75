# forge3d_tpu/determinism.py — reference-parity import alias.
# The reference exposes this as python/forge3d/determinism.py; the
# implementation lives at forge3d_tpu.assurance.determinism (TERRA-DETERMINATA determinism hashes).

from forge3d_tpu.assurance.determinism import *  # noqa: F401,F403
from forge3d_tpu.assurance.determinism import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
