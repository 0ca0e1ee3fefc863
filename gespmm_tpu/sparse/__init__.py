from gespmm_tpu.sparse.formats import CSR, CSC, COO, csr_from_coo, csr_to_csc

__all__ = ["CSR", "CSC", "COO", "csr_from_coo", "csr_to_csc"]
