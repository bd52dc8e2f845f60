"""Weight-conversion CLI: torch BERT checkpoint -> msgpack -> Trainer weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_convert_bert_checkpoint_into_trainer(tmp_path):
    """Full path: HF torch BertModel -> convert CLI -> load into our
    TextEncoder inside MIBFNet, verify CLS parity."""
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBertModel

    from mdhs_tpu.cli.convert_weights import convert
    from mdhs_tpu.core.checkpoint import load_checkpoint, save_checkpoint
    from mdhs_tpu.models.bert import BertConfig, BertModel

    hf_cfg = HFBertConfig(
        vocab_size=100, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = HFBertModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    state = convert("bert", sd, num_layers=2, dest="text_encoder")
    path = str(tmp_path / "bert.msgpack")
    save_checkpoint(path, state)
    loaded = load_checkpoint(path)
    assert "text_encoder" in loaded["params"]
    assert "bert" in loaded["params"]["text_encoder"]

    # apply through our BertModel and compare against torch
    cfg = BertConfig(vocab_size=100, hidden_size=16, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=32, hidden_dropout=0.0,
                     attention_dropout=0.0)
    model = BertModel(cfg, dtype=jnp.float32)
    params = jax.tree_util.tree_map(
        jnp.asarray, loaded["params"]["text_encoder"]["bert"]
    )
    ids = np.random.default_rng(0).integers(0, 100, (2, 8)).astype(np.int32)
    out, _ = model.apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids.astype(np.int64))).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)
