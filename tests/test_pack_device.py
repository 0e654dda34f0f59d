"""Device-side bit packing must agree exactly with the host packer."""

import numpy as np

from mg_gcn_tpu import sparse
from mg_gcn_tpu.ops import spmm_pattern as sp


def test_device_pack_matches_host():
    g = sparse.random_graph(600, 7, seed=9)
    n_pad = sp.round_up(600, sp.N_ALIGN)
    host = sp.pack_csr_bits(g, n_pad).view(np.int32)
    dev = np.asarray(sp.pack_bits_on_device(g, n_pad, row_chunks=4))
    np.testing.assert_array_equal(dev, host)


def test_device_pack_chunking_edge_cases():
    # graph whose rows land entirely in the first chunk
    g = sparse.random_graph(100, 3, seed=10)
    n_pad = sp.N_ALIGN
    host = sp.pack_csr_bits(g, n_pad).view(np.int32)
    dev = np.asarray(sp.pack_bits_on_device(g, n_pad, row_chunks=8))
    np.testing.assert_array_equal(dev, host)
