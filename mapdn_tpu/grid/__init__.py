from mapdn_tpu.grid.model import Grid, build_ybus
from mapdn_tpu.grid.cases import make_case, CASES
