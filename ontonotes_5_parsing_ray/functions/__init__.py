"""Pure single-process kernels shared by Ray stages and the oracle.

Everything in this package is deterministic, import-light and picklable so it
can be captured in ``map_batches`` UDF closures without shipping heavy state.
"""
