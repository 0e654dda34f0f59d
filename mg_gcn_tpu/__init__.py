"""mg_gcn_tpu — a TPU-native full-batch GCN training framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference multi-GPU C++/CUDA framework (GT-TDAlab/MG-GCN): PIGO-format graph
ingestion, CSR preprocessing, SpMM aggregation kernels, forward/backward GCN
layers, Adam training, PageRank, and a 1-D row-partitioned distributed mode
over a JAX device mesh.
"""

__version__ = "0.1.0"

from .formats import CSRData, Dataset, read_dense, read_pigo_csr, write_dense, write_pigo_csr  # noqa: F401
from .models.gcn import GCNConfig, forward, init_params, loss_and_grad  # noqa: F401
from .ops.spmm import AggPair, COOMat, aggregate, spmm  # noqa: F401
