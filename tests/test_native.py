"""Native (C++) runtime component tests: tokenizer and postings-build parity
with the pure-Python implementations. Skipped when librrt_native.so is not
built (`make -C review_recommender_tpu/native`)."""
import random
import string

import numpy as np
import pytest

from review_recommender_tpu.utils.text import _tokenize_document_py

native = pytest.importorskip("review_recommender_tpu.native")
if not native.native_available():
    pytest.skip("librrt_native.so not built", allow_module_level=True)


CASES = [
    "The QUICK brown-fox jump's over, this is it!! 99 a",
    "wireless   bluetooth\nheadphones with NOISE-cancelling (ANC)",
    "won't don't can't it's 'quoted' trailing' 'leading",
    "",
    "a",
    "ab",
    "x'y",
    "x" * 200 + " the " + "y" * 80,  # tokens longer than any fixed buffer
    "café résumé KKelvin",  # non-ascii -> python fallback path
]


class TestTokenizerParity:
    @pytest.mark.parametrize("text", CASES)
    def test_cases(self, text):
        assert native.tokenize_document_native(text) == _tokenize_document_py(text)

    def test_fuzz(self):
        rng = random.Random(7)
        alpha = string.ascii_letters + string.digits + " '.,-!?\n\t"
        for _ in range(300):
            t = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 200)))
            assert native.tokenize_document_native(t) == _tokenize_document_py(t), repr(t)

    def test_cap(self):
        text = " ".join(f"tok{i}" for i in range(50))
        assert native.tokenize_document_native(text, cap=10) == \
            _tokenize_document_py(text, cap=10)

    def test_batch_matches_single(self):
        texts = CASES + ["more text here ok fine"]
        batch = native.tokenize_corpus_native(texts)
        for t, got in zip(texts, batch):
            assert got == _tokenize_document_py(t)


class TestSubstringScan:
    def test_matches_numpy_char_find(self):
        terms = [f"word{i}x" for i in range(500)] + [
            "sock", "socks", "tubesocks", "wireless"
        ]
        blob = ("\n".join(terms) + "\n").encode()
        arr = np.array(terms, dtype=np.str_)
        for tok in ["sock", "word1", "zzz", "x", "wireless", "w"]:
            ref = (np.char.find(arr, tok) >= 0).nonzero()[0] + 1
            got = native.substring_scan_native(blob, tok)
            np.testing.assert_array_equal(got, ref)

    def test_featurizer_parity(self):
        from review_recommender_tpu.engine.featurize import QueryFeaturizer
        from review_recommender_tpu.index.build import build_bundle_from_products
        from tests.test_engine_parity import make_corpus

        products, emb, _r, _re = make_corpus(n=48, dim=16, seed=9)
        b = build_bundle_from_products(products, emb, pad_multiple=16,
                                       doc_terms_cap=64)
        f_nat = QueryFeaturizer(b.products)
        assert f_nat._vocab_blob is not None
        f_py = QueryFeaturizer(b.products)
        f_py._vocab_blob = None  # force numpy path
        f_py._native = None
        for q in ["yellow cat socks", "wireless bluetooth headphones"]:
            np.testing.assert_array_equal(
                f_nat.featurize(q).pack(), f_py.featurize(q).pack()
            )

    def test_trigram_expand_parity(self):
        """Native trigram-index expand_token == the numpy substring scan,
        including mid-term matches, no-match tokens, short (<3) tokens and
        the df-desc cap ordering."""
        from review_recommender_tpu.native import NativeQueryFeaturizer

        rng = np.random.default_rng(4)
        base = ["sock", "socks", "tubesocks", "wiresocket", "wireless",
                "blue", "blues", "bluetooth", "ultrablue", "cat"]
        terms = base + [f"w{i}rd{i}x" for i in range(500)]
        blob = ("\n".join(terms) + "\n").encode()
        arr = np.array(terms, dtype=np.str_)
        df = np.concatenate([[0], rng.integers(1, 100, len(terms))]).astype(
            np.int32)
        idf = np.log1p(1.0 / np.maximum(df, 1)).astype(np.float32)
        cap = 8
        nat = NativeQueryFeaturizer(blob, df, idf, 32, cap)
        for tok in ["sock", "blue", "socket", "zzzz", "at", "x", "rd1",
                    "wireless", "q"]:
            hits = (np.char.find(arr, tok) >= 0).nonzero()[0] + 1
            if len(hits) > cap:
                order = np.argsort(-df[hits], kind="stable")[:cap]
                hits = hits[order]
            got = nat.expand_token(tok)
            np.testing.assert_array_equal(got, hits.astype(np.int32),
                                          err_msg=f"token={tok!r}")


class TestPostingsBuild:
    def test_bit_exact_vs_python_build(self):
        from review_recommender_tpu.index.build import build_product_index
        from tests.test_engine_parity import make_corpus

        products, emb, _r, _re = make_corpus(n=64, dim=16, seed=11)
        texts = [p["agg_text"] for p in products]
        skus = [p["sku"] for p in products]
        nr = [p["n_reviews"] for p in products]
        st = [p["avg_stars"] for p in products]

        py = build_product_index(
            skus, texts, nr, st, emb, doc_terms_cap=32, pad_multiple=8,
            token_lists=[_tokenize_document_py(t) for t in texts],
        )
        nat = build_product_index(
            skus, texts, nr, st, emb, doc_terms_cap=32, pad_multiple=8,
        )
        assert py.vocab == nat.vocab
        np.testing.assert_array_equal(py.doc_terms, nat.doc_terms)
        np.testing.assert_array_equal(py.doc_tf, nat.doc_tf)
        np.testing.assert_array_equal(py.doc_len, nat.doc_len)
        np.testing.assert_array_equal(py.df, nat.df)
        np.testing.assert_allclose(py.idf, nat.idf)

    def test_truncation_counted(self):
        texts = [" ".join(f"t{i}x" for i in range(40))] * 3
        _dt, _tf, _dl, _df, _vocab, n_trunc = native.build_postings_native(
            texts, doc_terms_cap=8
        )
        assert n_trunc == 3

    def test_empty_corpus(self):
        dt, tf, dl, df, vocab, nt = native.build_postings_native([], 16)
        assert dt.shape[0] == 0 and vocab == {} and nt == 0
