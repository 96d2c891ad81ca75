# forge3d_tpu/assurance — certificates, provenance, determinism gates.
from . import certificate  # noqa: F401
