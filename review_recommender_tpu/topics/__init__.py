"""Topic analytics: TPU spherical k-means + density (HDBSCAN-semantics)
clustering, TF-IDF/LLM topic naming (concrete Ollama/OpenAI-wire adapters in
llm_clients), aspect metrics, resume-safe topic cards (reference archive
pipeline, SURVEY.md §2b, rebuilt TPU/dependency-free)."""
from review_recommender_tpu.topics.cards import generate_topic_cards, pick_quotes  # noqa: F401
from review_recommender_tpu.topics.cluster import kmeans_sanity, spherical_kmeans  # noqa: F401
from review_recommender_tpu.topics.density import (  # noqa: F401
    density_cluster,
    knn_graph,
    knn_graph_sharded,
)
from review_recommender_tpu.topics.naming import (  # noqa: F401
    aspect_metrics,
    map_label_to_aspect,
    name_topics,
    name_topics_llm,
    tfidf_topic_terms,
)
