#!/usr/bin/env python
"""Generate the example linear power spectrum table (EH98, z=0)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pysco_tpu.cosmo import write_power_spectrum_table

here = os.path.dirname(os.path.abspath(__file__))
out = os.path.join(here, "pk_eh98_z0.dat")
write_power_spectrum_table(out, H0=72.0, Om_m=0.25733)
print(f"wrote {out}")
