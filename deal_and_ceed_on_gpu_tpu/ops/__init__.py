from . import sum_factorization, local_global

__all__ = ["sum_factorization", "local_global"]
