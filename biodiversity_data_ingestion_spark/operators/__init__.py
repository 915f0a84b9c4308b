from . import aggregates, classify, cleaning, dedup, joins, similarity, textops  # noqa: F401
