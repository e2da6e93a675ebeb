from mapdn_tpu.traditional.droop import droop_control_law, droop_solve
from mapdn_tpu.traditional.opf import opf_solve
