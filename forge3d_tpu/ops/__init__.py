# forge3d_tpu/ops — device compute kernels (jnp + Pallas).
from . import pyramid, rng, shading, tonemap, traversal  # noqa: F401
