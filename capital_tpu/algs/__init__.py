from capital_tpu.algs import cholinv, cacqr

__all__ = ["cholinv", "cacqr"]
