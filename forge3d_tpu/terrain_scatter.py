# forge3d_tpu/terrain_scatter.py — reference-parity import alias.
# The reference exposes this as python/forge3d/terrain_scatter.py; the
# implementation lives at forge3d_tpu.terrain.scatter (scatter instancing).

from forge3d_tpu.terrain.scatter import *  # noqa: F401,F403
from forge3d_tpu.terrain.scatter import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
