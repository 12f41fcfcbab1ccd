"""Cross-feature combination tests: int8 corpus x eager BM25 x e2e rerank —
the dispatch points interact, so exercise them together."""
import numpy as np
import pytest

import jax.numpy as jnp

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import (
    attach_eager_bm25,
    attach_rerank_tokens,
    build_bundle_from_products,
)
from review_recommender_tpu.models.bert import BertConfig
from review_recommender_tpu.models.encoder import BiEncoder, CrossEncoder
from review_recommender_tpu.models.tokenizer import HashTokenizer
from review_recommender_tpu.ops.fusion import FusionWeights
from tests.test_engine_parity import make_corpus


@pytest.fixture(scope="module")
def full_bundle():
    tok = HashTokenizer(vocab_size=512)
    be = BiEncoder.random_init(BertConfig.tiny(vocab_size=512), tokenizer=tok,
                               seed=0, dtype=jnp.float32)
    products, _e, _r, _re = make_corpus(n=32, dim=64, seed=51)
    texts = [p["agg_text"][:100] for p in products]
    for p, t in zip(products, texts):
        p["agg_text"] = t
    emb = be.encode(texts)
    bundle = build_bundle_from_products(products, emb, pad_multiple=8,
                                        doc_terms_cap=48)
    attach_eager_bm25(bundle.products)
    attach_rerank_tokens(bundle.products, tok, max_tokens=32)
    ce = CrossEncoder.random_init(BertConfig.tiny(vocab_size=512),
                                  tokenizer=tok, seed=1, dtype=jnp.float32)
    return bundle, be, ce


W = FusionWeights.make(w_dense=0.4, w_bm25=0.3, w_rerank=0.2, w_prior=0.1,
                       min_reviews=5, gate_penalty=0.5)


def test_int8_plus_eager_run_search(full_bundle):
    bundle, be, _ce = full_bundle
    eng = SearchEngine(bundle, emb_dtype="int8", gate_mode="device",
                       query_encoder=be)
    assert "emb_q" in eng.arrays and "doc_bm25" in eng.arrays
    df, _s, _d = eng.run_search("wireless headphones", k=5, rerank_k=0)
    assert len(df) == 5 and np.isfinite(df["_final"]).all()
    assert (df["_bm25"] >= 0).all()


def test_int8_plus_eager_plus_e2e_rerank(full_bundle):
    bundle, be, ce = full_bundle
    eng = SearchEngine(bundle, emb_dtype="int8", gate_mode="device")
    eng.attach_models(be, ce)
    rows, scores = eng.query_e2e("yellow cat socks", W,
                                 pool=bundle.products.n_padded, k=6, rr_k=4)
    assert np.asarray(rows).shape == (6,)
    assert np.isfinite(np.asarray(scores)[0])

    # against the f32/classic engine with the same towers: overlapping top
    # sets (int8 quantization allows near-tie reordering)
    bundle2 = build_bundle_from_products(
        [{"sku": s, "agg_text": t, "n_reviews": nr, "avg_stars": st}
         for s, t, nr, st in zip(
             bundle.products.skus, bundle.products.agg_texts,
             bundle.products.n_reviews, bundle.products.avg_stars)],
        bundle.products.emb[: bundle.products.n_docs],
        pad_multiple=8, doc_terms_cap=48,
    )
    attach_rerank_tokens(bundle2.products, be.tokenizer, max_tokens=32)
    ref = SearchEngine(bundle2, emb_dtype="float32", gate_mode="device")
    ref.attach_models(be, ce)
    rows_f, _sf = ref.query_e2e("yellow cat socks", W,
                                pool=bundle2.products.n_padded, k=6, rr_k=4)
    overlap = len(set(np.asarray(rows).tolist())
                  & set(np.asarray(rows_f).tolist()))
    assert overlap >= 4


def test_sharded_int8(full_bundle):
    import jax

    from review_recommender_tpu.parallel.sharded import ShardedSearchEngine

    bundle, be, _ce = full_bundle
    s8 = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="int8")
    assert "emb_q" in s8.arrays
    sf = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32")
    rng = np.random.default_rng(5)
    qv = rng.standard_normal(64).astype(np.float32)
    qv /= np.linalg.norm(qv)
    r8, sc8 = s8.query_fused(qv, "wireless headphones", W, pool=16, k=8)
    rf, scf = sf.query_fused(qv, "wireless headphones", W, pool=16, k=8)
    overlap = len(set(np.asarray(r8).tolist()) & set(np.asarray(rf).tolist()))
    assert overlap >= 6  # int8 quantization may swap near-ties
    i8, d8 = s8.dense_topk(qv, k=8)
    if_, df_ = sf.dense_topk(qv, k=8)
    np.testing.assert_allclose(np.asarray(d8), np.asarray(df_), atol=0.03)
