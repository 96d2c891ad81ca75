# forge3d_tpu/terrain_params.py — reference-parity import alias.
# The reference exposes this as python/forge3d/terrain_params.py; the
# implementation lives at forge3d_tpu.terrain.params (TerrainRenderParams dataclass tree).

from forge3d_tpu.terrain.params import *  # noqa: F401,F403
from forge3d_tpu.terrain.params import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
