"""Builtin pipeline procedures.

The reference exposes server-side functionality through stored
procedures (`EXECUTE name(args)`, ifc/nowproc.c); this module
pre-registers the repo's pipeline operators under the same surface, so
a SQL-dialect user reaches dedup / data-selection / tokenization
without leaving the session:

    exec pipe.exact_dedup('docs')
    exec pipe.minhash_pairs('docs', 8, 4, 0.5)
    exec pipe.semdedup('vectors', 8, 0.35)
    exec pipe.dsir_weights('docs', 'lang', 'en', 256)
    exec pipe.bpe_tokenize('docs', 8)
    exec pipe.text_stats('docs')
    exec pipe.quality_filter('docs', 'lang', 'en', 64, 4)
    exec pipe.perplexity('docs', 2048)
    exec pipe.profile('docs')
    exec pipe.line_dedup('docs')
    exec pipe.domain_mix('docs', 'source', 200, 0.5, 13)
    exec pipe.dedup_increment('lsh_idx', 'batch', 8, 4, 0.5)
    exec pipe.hll_distinct('orders', 'o_custkey')
    exec pipe.heavy_hitters('lineitem', 'l_suppkey', 620)
    exec pipe.quantiles('lineitem', 'l_extendedprice')
    exec pipe.fuzzy_pairs('part', 'p_name', 2)

Every procedure takes a context/mount/view NAME plus constant
parameters (the reference's EXEC restriction) and returns a cursor —
the same FETCH/CLOSE paging as any SELECT.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def register_builtin_procs(engine) -> None:
    from nowdb_spark.operators import corpus as C
    from nowdb_spark.operators import dedup as D
    from nowdb_spark.operators import similarity as S
    from nowdb_spark.operators import tokenize as TK

    def exact_dedup(session, ctx, content_col="text", id_col="doc_id"):
        return D.exact_dedup(session.dataframe(ctx),
                             str(content_col), str(id_col))

    def minhash_pairs(session, ctx, k=8, bands=4, threshold=0.5):
        return D.minhash_lsh_pairs(session.dataframe(ctx), k=int(k),
                                   bands=int(bands),
                                   threshold=float(threshold))

    def semdedup(session, ctx, n_centroids=8, threshold=0.8,
                 id_col="vec_id", vec_col="embedding"):
        return S.semdedup(session.dataframe(ctx),
                          n_centroids=int(n_centroids),
                          threshold=float(threshold),
                          id_col=str(id_col), vec_col=str(vec_col))

    def dsir_weights(session, ctx, target_col, target_value,
                     buckets=256):
        return C.importance_weights(
            session.dataframe(ctx),
            F.col(str(target_col)) == target_value,
            buckets=int(buckets))

    def bpe_tokenize(session, ctx, n_merges=8, text_col="text",
                     id_col="doc_id"):
        df = session.dataframe(ctx)
        merges = TK.bpe_train(df, n_merges=int(n_merges),
                              text_col=str(text_col))
        return TK.bpe_segment(df, merges, text_col=str(text_col),
                              id_col=str(id_col))

    def text_stats(session, ctx):
        from nowdb_spark.operators import textops as T
        return T.with_text_stats(session.dataframe(ctx))

    def quality_filter(session, ctx, label_col, label_value,
                       buckets=64, iters=4):
        from nowdb_spark.operators import quality as Q
        df = session.dataframe(ctx)
        w, b = Q.train_quality_classifier(
            df, F.col(str(label_col)) == label_value,
            buckets=int(buckets), iters=int(iters))
        return Q.quality_score(df, w, b)

    def perplexity(session, ctx, buckets=2048):
        from nowdb_spark.operators import quality as Q
        df = session.dataframe(ctx)
        uni, bi = Q.train_bigram_lm(df, buckets=int(buckets))
        return Q.perplexity(df, uni, bi)

    def profile(session, ctx):
        from nowdb_spark.operators.profile import profile as P
        return P(session.dataframe(ctx))

    def line_dedup(session, ctx, text_col="text", id_col="doc_id"):
        return C.line_dedup(session.dataframe(ctx),
                            text_col=str(text_col), id_col=str(id_col))

    def domain_mix(session, ctx, domain_col="source", total=200,
                   alpha=0.5, seed=13):
        return C.domain_mix_sample(session.dataframe(ctx),
                                   domain_col=str(domain_col),
                                   total=int(total), alpha=float(alpha),
                                   seed=int(seed))

    def dedup_increment(session, index_ctx, batch_ctx, k=8, bands=4,
                        threshold=0.5):
        return D.lsh_increment_pairs(session.dataframe(index_ctx),
                                     session.dataframe(batch_ctx),
                                     k=int(k), bands=int(bands),
                                     threshold=float(threshold))

    from nowdb_spark.operators import fuzzy as FZ
    from nowdb_spark.operators import sketches as SK

    def hll_distinct(session, ctx, col):
        return SK.hll_distinct(session.dataframe(ctx), str(col))

    def heavy_hitters(session, ctx, col, min_count):
        return SK.cms_heavy_hitters(session.dataframe(ctx), str(col),
                                    int(min_count))

    def quantiles(session, ctx, col, k=4096):
        return SK.kll_quantiles(session.dataframe(ctx), str(col),
                                (0.01, 0.05, 0.1, 0.25, 0.5,
                                 0.75, 0.9, 0.95, 0.99), k=int(k))

    def fuzzy_pairs(session, ctx, col, max_dist=2):
        return FZ.fuzzy_pairs(session.dataframe(ctx), str(col),
                              max_dist=int(max_dist))

    from nowdb_spark.operators import layout as LA

    def _bloom_paths(session, ctx, col):
        sc = session.engine._need_scope()
        data = sc.context_dir(str(ctx))
        return data, data.parent / f"{ctx}__bloomidx__{col}"

    def bloom_index(session, ctx, col):
        """Build the per-file Bloom sidecar over a stored context
        column — the executable form of CREATE INDEX for point
        lookups (engine.py:252 keeps the DDL as metadata; this is
        the artifact)."""
        data, idx = _bloom_paths(session, ctx, col)
        LA.write_bloom_index(session.spark, str(data), str(col),
                             str(idx))
        sidx = session.spark.read.parquet(str(idx))
        from pyspark.sql import functions as F
        return sidx.agg(
            F.countDistinct("file").alias("files_indexed"),
            F.expr("sum(bit_count(mask))").alias("bits_set"))

    def bloom_lookup(session, ctx, col, value):
        """Point lookup through the sidecar: prunes the file list
        before scanning; identical rows to a full filter."""
        data, idx = _bloom_paths(session, ctx, col)
        return LA.indexed_point_lookup(session.spark, str(data),
                                       str(idx), str(col), [value])

    for name, fn in [("exact_dedup", exact_dedup),
                     ("hll_distinct", hll_distinct),
                     ("heavy_hitters", heavy_hitters),
                     ("quantiles", quantiles),
                     ("fuzzy_pairs", fuzzy_pairs),
                     ("minhash_pairs", minhash_pairs),
                     ("semdedup", semdedup),
                     ("dsir_weights", dsir_weights),
                     ("bpe_tokenize", bpe_tokenize),
                     ("text_stats", text_stats),
                     ("quality_filter", quality_filter),
                     ("perplexity", perplexity),
                     ("profile", profile),
                     ("line_dedup", line_dedup),
                     ("domain_mix", domain_mix),
                     ("dedup_increment", dedup_increment),
                     ("bloom_index", bloom_index),
                     ("bloom_lookup", bloom_lookup)]:
        engine.register_procedure(f"pipe.{name}", fn)
