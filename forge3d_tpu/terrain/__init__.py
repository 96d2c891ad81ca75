# forge3d_tpu/terrain — terrain rendering engine (renderer, params, offline
# accumulation, clipmap/streaming to come).
from .params import TerrainRenderParams, make_terrain_params  # noqa: F401
from .renderer import IBL, MaterialSet, TerrainRenderer  # noqa: F401
from .offline import (  # noqa: F401
    OfflineProgress,
    OfflineQualitySettings,
    OfflineResult,
    render_offline,
)
