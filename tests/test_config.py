"""Config CLI parsing + run_args.json round-trip."""
import os

from canonicalsg2im_tpu.config import Config, parse_cli


def test_cli_parses_reference_style_flags():
    cfg = parse_cli([
        "--dataset", "packed_clevr", "--batch_size", "6",
        "--image_size", "128,128", "--learned_converse", "1",
        "--skip_generation", "1", "--num_val_samples", "64",
        "--learning_rate", "2e-4", "--norm_G", "spadeinstance3x3",
        "--mesh_shape", "4,2",
    ])
    assert cfg.dataset == "packed_clevr"
    assert cfg.batch_size == 6
    assert cfg.image_size == (128, 128)
    assert cfg.learned_converse is True
    assert cfg.skip_generation is True
    assert cfg.num_val_samples == 64
    assert abs(cfg.learning_rate - 2e-4) < 1e-12
    assert cfg.norm_G == "spadeinstance3x3"
    assert cfg.mesh_shape == (4, 2)


def test_bool_flag_zero_disables():
    cfg = parse_cli(["--learned_converse", "0", "--shuffle_val", "0"])
    assert cfg.learned_converse is False
    assert cfg.shuffle_val is False


def test_run_args_round_trip(tmp_path):
    cfg = Config(dataset="vg", image_size=(64, 64), learned_transitivity=True,
                 num_train_samples=123, bucket_objects=(8, 32))
    path = os.path.join(tmp_path, "run_args.json")
    cfg.save(path)
    back = Config.load(path)
    assert back.dataset == "vg"
    assert back.image_size == (64, 64)
    assert back.learned_transitivity is True
    assert back.num_train_samples == 123
    assert back.bucket_objects == (8, 32)


def test_finalize_derives_semantic_nc():
    from canonicalsg2im_tpu.data.vocab import build_clevr_vocab

    cfg = Config(embedding_dim=32)
    cfg.vocab = build_clevr_vocab()
    cfg.finalize()
    assert cfg.semantic_nc == 4 * 32
    assert cfg.num_predicates == len(cfg.vocab["pred_idx_to_name"])
