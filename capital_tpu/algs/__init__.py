from capital_tpu.algs import cholinv, cacqr

__all__ = ["cholinv", "cacqr"]
# heavier spectral modules (polar, eigh, svd) and the completions of the
# reference's stubs (rectri, newton, trsm) import lazily:
#   from capital_tpu.algs import polar, eigh, svd, rectri, newton, trsm
