# forge3d_tpu/text_atlas.py — reference-parity import alias.
# The reference exposes this as python/forge3d/text_atlas.py; the
# implementation lives at forge3d_tpu.labels.atlas (glyph SDF atlas baking).

from forge3d_tpu.labels.atlas import *  # noqa: F401,F403
from forge3d_tpu.labels.atlas import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
