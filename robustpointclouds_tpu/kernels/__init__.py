from .masked_stats import masked_stats

__all__ = ["masked_stats"]
