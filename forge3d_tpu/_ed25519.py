# forge3d_tpu/_ed25519.py — reference-parity import alias.
# The reference exposes this as python/forge3d/_ed25519.py; the
# implementation lives at forge3d_tpu.assurance.ed25519 (RFC 8032 Ed25519).

from forge3d_tpu.assurance.ed25519 import *  # noqa: F401,F403
from forge3d_tpu.assurance.ed25519 import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
