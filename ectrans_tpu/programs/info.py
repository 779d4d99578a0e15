"""`ectrans-tpu` info command (the installed ``ectrans`` script analogue,
reference ``src/programs/ectrans.in:19-40``): prints version, backend and
feature configuration."""

from __future__ import annotations


def main():
    import jax

    import ectrans_tpu as et
    from ectrans_tpu import native

    print(f"ectrans_tpu version {et.__version__}")
    print(f"jax {jax.__version__}, backend: {jax.default_backend()}, "
          f"devices: {jax.device_count()}")
    print(f"native legendre builder: "
          f"{'available' if native.available() else 'unavailable (NumPy fallback)'}")
    print("features: global spherical harmonics (full/reduced/octahedral "
          "Gaussian grids), LAM bi-Fourier (etrans), adjoints, "
          "distributed (w, v) mesh transforms, lat-lon output, "
          "stretched-sphere Legendre polynomials, ectrans4py-compatible "
          "API, C API (src/capi)")


if __name__ == "__main__":
    main()
