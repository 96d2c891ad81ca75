# forge3d_tpu/certificate.py — reference-parity import alias.
# The reference exposes this as python/forge3d/certificate.py; the
# implementation lives at forge3d_tpu.assurance.certificate (CENSOR signed render certificates).

from forge3d_tpu.assurance.certificate import *  # noqa: F401,F403
from forge3d_tpu.assurance.certificate import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
