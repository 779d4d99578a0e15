from . import layout, spectral, legendre_matmul, fourier  # noqa: F401
