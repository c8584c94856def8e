"""In-graph numeric ops: control synthesis, QP assembly, the batched ADMM solver, UKF."""
