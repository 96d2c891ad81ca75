# forge3d_tpu/label_plan.py — reference-parity import alias.
# The reference exposes this as python/forge3d/label_plan.py; the
# implementation lives at forge3d_tpu.labels.plan (label planning + declutter).

from forge3d_tpu.labels.plan import *  # noqa: F401,F403
from forge3d_tpu.labels.plan import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
