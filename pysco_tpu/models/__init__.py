"""Gravity-model operators: linear Laplacian, f(R) scalaron (cubic/quartic),
QUMOND source, and the multigrid solvers that drive them."""
