"""Benchmark / validation drivers (the ``src/programs`` analogue)."""
