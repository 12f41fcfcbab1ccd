# Serving image (reference Dockerfile parity: multi-stage, non-root,
# HEALTHCHECK — rebuilt for the TPU framework; on TPU VMs use a jax[tpu]
# base instead of the CPU wheel).
FROM python:3.12-slim AS build

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY review_recommender_tpu/ review_recommender_tpu/
COPY pyproject.toml bench.py ./
RUN make -C review_recommender_tpu/native

FROM python:3.12-slim
RUN pip install --no-cache-dir "jax[cpu]" flax optax numpy pandas pyarrow \
    && useradd -m -u 1000 appuser

WORKDIR /app
COPY --from=build /app /app
COPY start.sh ./
RUN chmod +x start.sh && chown -R appuser /app
USER appuser

ENV APP_PORT=8501 INDEX_DIR=/app/data/index ENVIRONMENT=production
EXPOSE 8501

HEALTHCHECK --interval=30s --timeout=5s --start-period=120s --retries=3 \
    CMD python -m review_recommender_tpu.serve.cli health \
        --url http://localhost:8501 || exit 1

CMD ["./start.sh"]
