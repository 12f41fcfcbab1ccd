# Developer / deployment entry points (reference Makefile parity:
# test / build / run / data-prep targets, rebuilt for this framework).

PY ?= python
INDEX_DIR ?= data/index
PORT ?= 8501

.PHONY: test test-fast native bench serve audit eval index-import docker-build docker-run clean

test: native
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -m "not integration"

native:
	$(MAKE) -C review_recommender_tpu/native

bench:
	$(PY) bench.py

serve:
	$(PY) -m review_recommender_tpu.serve.cli serve --index-dir $(INDEX_DIR) --port $(PORT)

audit:
	$(PY) -m review_recommender_tpu.serve.cli audit --index-dir $(INDEX_DIR)

eval:
	$(PY) -m review_recommender_tpu.evals.benchmark --index-dir $(INDEX_DIR)

# import the reference's artifact files into a bundle:
#   make index-import EMB=product_emb.npy META=product_emb_meta.parquet BM25=product_bm25.pkl
index-import:
	$(PY) -c "from review_recommender_tpu.data import import_reference_artifacts as f; \
	          f('$(EMB)', '$(META)', bm25_pkl='$(BM25)' or None, out_dir='$(INDEX_DIR)')"

docker-build:
	docker build -t review-recommender-tpu .

docker-run:
	docker run --rm -p $(PORT):$(PORT) -v $(PWD)/data:/app/data:ro review-recommender-tpu

clean:
	$(MAKE) -C review_recommender_tpu/native clean
	rm -rf .pytest_cache __pycache__
