from gespmm_tpu.models.gcn import GCN
from gespmm_tpu.models.sage import GraphSAGE

__all__ = ["GCN", "GraphSAGE"]
