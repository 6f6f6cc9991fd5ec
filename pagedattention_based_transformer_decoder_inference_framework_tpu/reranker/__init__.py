from .api import LogProbScorer, Reranker, RerankScorer

__all__ = ["Reranker", "RerankScorer", "LogProbScorer"]
