"""Large-scale data-pipeline operators (extensions beyond the
reference's own surface, per the north star): deduplication,
similarity search, text analysis, multimodal columns, graph helpers.

All operators are DataFrame → DataFrame transformations built from
JVM-side functions wherever possible; Python appears only as
Arrow-batched Pandas UDFs (multimodal decode plumbing, vectorized
numeric kernels).
"""
