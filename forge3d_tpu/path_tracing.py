# forge3d_tpu/path_tracing.py — reference-parity import alias.
# The reference exposes this as python/forge3d/path_tracing.py; the
# implementation lives at forge3d_tpu.pt.path_tracer (PathTracer facade).

from forge3d_tpu.pt.path_tracer import *  # noqa: F401,F403
from forge3d_tpu.pt.path_tracer import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
