#!/usr/bin/env python
# examples/astro_validation.py — SIDERA ephemeris validation demo: solar
# and planetary positions over a year, moon phases, and the validation
# metrics report (the reference's astro validation examples; ref
# src/astro/ + tests/astro_oracle.rs).
#
# Usage: python examples/astro_validation.py

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from forge3d_tpu.astro import (astro_body_position, astro_moon_phase,
                                   astro_sidereal_time, julian_date)

    print("SIDERA ephemeris validation (bounded 2000-2050)")
    print("=" * 56)
    for month in (1, 4, 7, 10):
        jd = julian_date(2026, month, 15, 0)
        sun = astro_body_position("sun", jd)
        mars = astro_body_position("mars", jd)
        phase = astro_moon_phase(jd)
        lst = astro_sidereal_time(jd, -121.76)
        print(f"2026-{month:02d}-15  sun RA {sun['ra_deg']:7.2f} "
              f"dec {sun['dec_deg']:6.2f} | mars RA {mars['ra_deg']:7.2f} "
              f"| moon illum {phase['illuminated_fraction']:.2f} "
              f"| LST {lst:6.2f}h")

    # cross-check: the equinox sun declination is ~0
    jd_eq = julian_date(2026, 3, 20, 12)
    dec = astro_body_position("sun", jd_eq)["dec_deg"]
    print(f"\nequinox sun declination: {dec:+.3f} deg (expect ~0)")
    assert abs(dec) < 0.7


if __name__ == "__main__":
    main()
