from capital_tpu.parallel import summa

__all__ = ["summa"]
