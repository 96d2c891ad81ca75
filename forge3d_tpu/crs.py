# forge3d_tpu/crs.py — reference-parity import alias.
# The reference exposes this as python/forge3d/crs.py; the
# implementation lives at forge3d_tpu.geo.crs (MENSURA CRS engine).

from forge3d_tpu.geo.crs import *  # noqa: F401,F403
from forge3d_tpu.geo.crs import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
