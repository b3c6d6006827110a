"""Pure numpy/pyarrow codec kernels (no Spark imports).

Importing this package applies glibc malloc tuning (see _malloc.py) —
critical for vectorized kernel throughput in Spark Python workers.
"""

from . import _malloc  # noqa: F401  (side effect: mallopt tuning)
