"""Device-side compute kernels: mesh operators and spectral operators."""
