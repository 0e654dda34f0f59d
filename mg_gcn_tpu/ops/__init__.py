from . import elementwise, softmax_xent, spmm  # noqa: F401
