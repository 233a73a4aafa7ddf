from .hept import HeptAttention, prep_qk

__all__ = ["HeptAttention", "prep_qk"]
