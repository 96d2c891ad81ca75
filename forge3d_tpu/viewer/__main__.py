# python -m forge3d_tpu.viewer — viewer server entry point (the reference's
# `interactive_viewer` binary seam, src/bin/interactive_viewer.rs:1-7).

import sys

from .server import main

sys.exit(main())
