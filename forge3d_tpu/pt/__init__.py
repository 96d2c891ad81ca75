# forge3d_tpu/pt — path tracing engines (terrain reference, megakernel,
# wavefront-replacement fused sample loops).
from .terrain_ref import (  # noqa: F401
    TerrainRefDesc,
    hybrid_render_terrain_reference,
    render_terrain_reference,
)
