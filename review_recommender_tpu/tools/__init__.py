"""Ops tooling: file archiver (reference tools/archives.py parity).

Import submodules directly (`from review_recommender_tpu.tools.archiver
import archive_files`) — no eager re-exports so `python -m ...archiver`
stays warning-free."""
