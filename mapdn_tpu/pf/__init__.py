from mapdn_tpu.pf.newton import nr_solve, nr_solve_dense, PFResult, branch_results, bus_injections
