# forge3d_tpu/offline.py — reference-parity import alias.
# The reference exposes this as python/forge3d/offline.py; the
# implementation lives at forge3d_tpu.terrain.offline (offline progressive accumulation driver).

from forge3d_tpu.terrain.offline import *  # noqa: F401,F403
from forge3d_tpu.terrain.offline import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
