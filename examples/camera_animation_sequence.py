# examples/camera_animation_sequence.py — animation frames through the
# pipelined sequence renderer + camera rigs.
#
# Reference analogue: examples/camera_animation_demo.py +
# terrain_camera_rigs_demo.py (orbit rig keyframes -> frame sequence).
# Here the converged frames of a fixed-camera segment render through
# hybrid_render_terrain_sequence (device compute overlaps readback), and
# the orbit rig drives per-segment camera moves.
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import forge3d_tpu as f3d  # noqa: E402
from forge3d_tpu.camera_rigs import OrbitRig  # noqa: E402
from forge3d_tpu.io.image import numpy_to_png  # noqa: E402

OUT = pathlib.Path(__file__).parent / "out"
OUT.mkdir(exist_ok=True)


def main(n_segments: int = 2, frames_per_segment: int = 2,
         size: int = 64) -> None:
    n = 65
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = (9.0 * np.sin(x * 0.1) * np.cos(y * 0.08)
           + 2.0 * np.sin(x * 0.3) * np.cos(y * 0.25)).astype(np.float32)

    rig = OrbitRig(target=(32.0, 0.0, 32.0), radius=80.0,
                   phi_start_deg=20.0, phi_end_deg=120.0,
                   theta_deg=55.0)
    written = []
    for seg in range(n_segments):
        t = seg / max(n_segments - 1, 1)
        cam = rig.frame(t).as_dict()
        # frames of one segment share the camera -> one compiled
        # pipeline, pipelined dispatch
        outs = f3d.hybrid_render_terrain_sequence(
            dem, size, size, cam,
            seeds=[seg * 100 + k for k in range(frames_per_segment)],
            spp=1)
        for k, o in enumerate(outs):
            p = OUT / f"anim_seg{seg}_f{k}.png"
            numpy_to_png(p, o["rgba"])
            written.append(p.name)
    print(f"wrote {len(written)} frames: {written[:4]}...")


if __name__ == "__main__":
    main()
