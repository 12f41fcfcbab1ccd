"""Generate committed golden activations for torch-free model parity tests.

Run once (requires torch + transformers):

    python tests/make_goldens.py

Writes tests/goldens/bert_tiny.npz containing
  - the tiny HF BertModel / BertForSequenceClassification state dicts
    (seeded random init, HF parameter names as npz keys),
  - the test inputs (ids / attention mask / token types),
  - the HF forward outputs (normalized CLS embedding; classifier logit).

tests/test_models.py::TestGoldenParity replays these against the JAX towers
(models/bert.py + models/convert.py) WITHOUT torch installed — fixing the
round-1 gap where the torch-parity tests silently skipped on boxes without
torch (VERDICT.md Weak #1).
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.test_models import TINY, _rand_inputs  # noqa: E402

OUT = Path(__file__).parent / "goldens" / "bert_tiny.npz"


def main() -> None:
    import torch
    import transformers

    arrays = {}

    # --- bi-encoder golden ---
    hf_cfg = transformers.BertConfig(**TINY)
    torch.manual_seed(0)
    be = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    rng = np.random.default_rng(0)
    ids, mask, tt = _rand_inputs(rng, vocab=hf_cfg.vocab_size)
    with torch.no_grad():
        out = be(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tt),
        ).last_hidden_state.numpy()
    cls = out[:, 0, :]
    want = cls / np.maximum(np.linalg.norm(cls, axis=1, keepdims=True), 1e-12)
    arrays["be_in_ids"], arrays["be_in_mask"], arrays["be_in_tt"] = ids, mask, tt
    arrays["be_out"] = want.astype(np.float32)
    for k, v in be.state_dict().items():
        arrays["be_sd." + k] = v.numpy().astype(np.float32)

    # --- cross-encoder golden ---
    hf_cfg2 = transformers.BertConfig(**TINY)
    hf_cfg2.num_labels = 1
    torch.manual_seed(1)
    ce = transformers.BertForSequenceClassification(hf_cfg2).eval()
    rng = np.random.default_rng(1)
    ids, mask, tt = _rand_inputs(rng, vocab=hf_cfg2.vocab_size)
    with torch.no_grad():
        logits = ce(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tt),
        ).logits.numpy()[:, 0]
    arrays["ce_in_ids"], arrays["ce_in_mask"], arrays["ce_in_tt"] = ids, mask, tt
    arrays["ce_out"] = logits.astype(np.float32)
    for k, v in ce.state_dict().items():
        arrays["ce_sd." + k] = v.numpy().astype(np.float32)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes, {len(arrays)} arrays)")


if __name__ == "__main__":
    main()
