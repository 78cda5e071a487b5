"""Linear-system and kernel operations: Schur complement (direct +
implicit), matrix-free PCG, Hessian exporters, Pallas kernels."""
