# forge3d_tpu/text.py — reference-parity import alias.
# The reference exposes this as python/forge3d/text.py; the
# implementation lives at forge3d_tpu.labels.render (SDF text compositing).

from forge3d_tpu.labels.render import *  # noqa: F401,F403
from forge3d_tpu.labels.render import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
