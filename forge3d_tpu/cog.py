# forge3d_tpu/cog.py — reference-parity import alias.
# The reference exposes this as python/forge3d/cog.py; the
# implementation lives at forge3d_tpu.gis.cog (COG range reader).

from forge3d_tpu.gis.cog import *  # noqa: F401,F403
from forge3d_tpu.gis.cog import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
