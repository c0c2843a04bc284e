from cpcsv_tpu.ops.pallas.dfn import dfn_pallas

__all__ = ["dfn_pallas"]
