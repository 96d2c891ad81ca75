# forge3d_tpu/denoise.py — reference-parity import alias.
# The reference exposes this as python/forge3d/denoise.py; the
# implementation lives at forge3d_tpu.ops.denoise (a-trous/SVGF denoisers).

from forge3d_tpu.ops.denoise import *  # noqa: F401,F403
from forge3d_tpu.ops.denoise import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
