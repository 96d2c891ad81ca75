# forge3d_tpu/io — host-side image and data I/O.
from . import image, png  # noqa: F401
