from . import nthash, u64  # noqa: F401
