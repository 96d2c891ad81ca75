# forge3d_tpu/anamnesis.py — reference-parity import alias.
# The reference exposes this as python/forge3d/anamnesis.py; the
# implementation lives at forge3d_tpu.assurance.anamnesis (ANAMNESIS content-addressed render cache).

from forge3d_tpu.assurance.anamnesis import *  # noqa: F401,F403
from forge3d_tpu.assurance.anamnesis import __dict__ as _impl_dict

globals().update({k: v for k, v in _impl_dict.items()
                if not k.startswith('__')})
