# forge3d_tpu/_license.py — reference-parity import alias.
# The reference exposes this as python/forge3d/_license.py; the
# implementation lives at forge3d_tpu.assurance.license (offline Ed25519 license verification).

from forge3d_tpu.assurance.license import *  # noqa: F401,F403
from forge3d_tpu.assurance.license import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
