"""TF1 Saver checkpoint importer (train/import_tf1.py).

Writes a genuine V1-format checkpoint under the reference's variable names —
the rnn/multi_rnn_cell/cell_0/basic_lstm_cell LSTM scope, the global
dense_N / LayerNorm_N creation-order counters, the defineParam names
(uEmbed .. defaultParamNameK .. meta3Bias), Adam slots (<name>/Adam{,_1}),
and the unnamed global-step 'Variable' (ref model.py:246, 512-527) — then
imports it and installs it in a Trainer.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax

from sagnn_tpu.config import Config, ModelConfig, TrainConfig
from sagnn_tpu.data.synthetic import synthetic_dataset
from sagnn_tpu.models.selfgnn import init_params
from sagnn_tpu.train.import_tf1 import import_tf1_checkpoint
from sagnn_tpu.train.trainer import Trainer

MCFG = ModelConfig(graph_num=2, gnn_layer=1, att_layer=2, latdim=8,
                   num_heads=2, ssldim=4, pos_length=16, keep_rate=1.0)
STEP = 7
LSTM = "rnn/multi_rnn_cell/cell_0/basic_lstm_cell"


def reference_arrays(cfg: ModelConfig, num_users: int, num_items: int,
                     rng: np.random.Generator):
    """Random values for every variable the reference graph would create."""
    g, D, L = cfg.graph_num, cfg.latdim, cfg.pos_length
    shapes = {
        "uEmbed": (g, num_users, D),
        "iEmbed": (g, num_items, D),
        "posEmbed": (L, D),
        "timeEmbed": (2, D),
        f"{LSTM}/kernel": (2 * D, 4 * D),
        f"{LSTM}/bias": (4 * D,),
        "meta2": (3 * D, cfg.ssldim),
        "meta2Bias": (cfg.ssldim,),
        "meta3": (cfg.ssldim, 1),
        "meta3Bias": (1,),
    }
    for i in range(g * cfg.gnn_layer * 2):
        shapes[f"defaultParamName{i + 1}"] = (D, D)
    n_dense = 6 + 3 * cfg.att_layer
    for i in range(n_dense):
        sfx = "" if i == 0 else f"_{i}"
        shapes[f"dense{sfx}/kernel"] = (D, D)
        shapes[f"dense{sfx}/bias"] = (D,)
    for i in range(4 + cfg.att_layer):
        sfx = "" if i == 0 else f"_{i}"
        shapes[f"LayerNorm{sfx}/gamma"] = (D,)
        shapes[f"LayerNorm{sfx}/beta"] = (D,)
    arrays = {}
    for name, shape in shapes.items():
        arrays[name] = rng.standard_normal(shape).astype(np.float32)
        arrays[f"{name}/Adam"] = rng.standard_normal(shape).astype(np.float32)
        arrays[f"{name}/Adam_1"] = np.abs(
            rng.standard_normal(shape)).astype(np.float32)
    arrays["beta1_power"] = np.float32(0.9 ** STEP)
    arrays["beta2_power"] = np.float32(0.999 ** STEP)
    arrays["Variable"] = np.int32(STEP)
    return arrays


def save_v1_checkpoint(arrays, prefix: str) -> str:
    """tf.train.Saver with an explicit name->variable map: the checkpoint
    keys are exactly the reference graph's variable names."""
    with tf.Graph().as_default():
        tfvars = {name: tf.compat.v1.Variable(val, name=f"v{i}")
                  for i, (name, val) in enumerate(arrays.items())}
        saver = tf.compat.v1.train.Saver(var_list=tfvars)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            return saver.save(sess, prefix, write_meta_graph=False)


@pytest.fixture(scope="module")
def bundle():
    return synthetic_dataset(num_users=24, num_items=36, graph_num=2,
                             test_size=6, seed=3)


@pytest.fixture(scope="module")
def imported(bundle, tmp_path_factory):
    rng = np.random.default_rng(11)
    arrays = reference_arrays(MCFG, bundle.num_users, bundle.num_items, rng)
    prefix = save_v1_checkpoint(
        arrays, str(tmp_path_factory.mktemp("tf1") / "model"))
    out = import_tf1_checkpoint(prefix, MCFG, with_optimizer=True)
    return arrays, out


def test_structure_matches_init(imported, bundle):
    arrays, out = imported
    expect = jax.eval_shape(
        lambda k: init_params(k, MCFG, bundle.num_users, bundle.num_items),
        jax.random.PRNGKey(0))
    got_tree = jax.tree_util.tree_structure(out["params"])
    assert got_tree == jax.tree_util.tree_structure(expect)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_equal(np.shape(a), b.shape),
        out["params"], expect)
    for k in ("mu", "nu"):
        assert jax.tree_util.tree_structure(out[k]) == got_tree


def test_values_mapped_correctly(imported):
    arrays, out = imported
    p, mu, nu = out["params"], out["mu"], out["nu"]
    chk = np.testing.assert_array_equal
    chk(p["reg"]["u_embed"], arrays["uEmbed"])
    chk(p["reg"]["i_embed"], arrays["iEmbed"])
    chk(p["reg"]["time_fc"][1], arrays["defaultParamName2"])
    chk(p["free"]["lstm"]["kernel"], arrays[f"{LSTM}/kernel"])
    chk(p["free"]["lstm"]["bias"], arrays[f"{LSTM}/bias"])
    chk(p["free"]["mhsa_user"]["wq"], arrays["dense/kernel"])
    chk(p["free"]["mhsa_item"]["bv"], arrays["dense_5/bias"])
    # seq layer i=1 -> dense_{9,10,11}, LayerNorm_5
    chk(p["free"]["seq_mhsa"][1]["wk"], arrays["dense_10/kernel"])
    chk(p["free"]["seq_ln"][1]["scale"], arrays["LayerNorm_5/gamma"])
    chk(p["free"]["ln_item"]["shift"], arrays["LayerNorm_1/beta"])
    chk(p["free"]["seq_ln_pos"]["scale"], arrays["LayerNorm_3/gamma"])
    chk(mu["reg"]["meta2_w"], arrays["meta2/Adam"])
    chk(nu["free"]["meta3_b"], arrays["meta3Bias/Adam_1"])
    assert out["step"] == STEP


@pytest.mark.slow
def test_trainer_continues_from_import(imported, bundle, tmp_path_factory):
    arrays, out = imported
    cfg = Config(model=MCFG,
                 train=TrainConfig(batch=8, samp_num=4, ssl_num=3, trn_num=16,
                                   test_size=6, epoch=1, tst_epoch=1, lr=1e-3,
                                   reg=1e-4, ssl_reg=1e-6))
    tr = Trainer(cfg, bundle, ckpt_root=str(tmp_path_factory.mktemp("ck")),
                 pad_multiple=32)
    tr.load_imported_params(**out)
    np.testing.assert_array_equal(
        np.asarray(tr.state["params"]["reg"]["u_embed"]), arrays["uEmbed"])
    adam_state = tr.state["opt_state"][0]
    assert int(adam_state.count) == STEP
    np.testing.assert_array_equal(np.asarray(adam_state.mu["reg"]["meta3_w"]),
                                  arrays["meta3/Adam"])
    assert int(tr.state["step"]) == STEP
    tr.train_epoch(verbose=False)  # state is consumable by the jitted step
    assert int(tr.state["step"]) == STEP + cfg.train.trn_num // cfg.train.batch


def test_shape_mismatch_rejected(imported, bundle, tmp_path_factory):
    _, out = imported
    cfg = Config(model=MCFG,
                 train=TrainConfig(batch=8, samp_num=4, ssl_num=3, trn_num=16,
                                   test_size=6))
    small = synthetic_dataset(num_users=12, num_items=20, graph_num=2,
                              test_size=4, seed=5)
    tr = Trainer(cfg, small, ckpt_root=str(tmp_path_factory.mktemp("ck2")),
                 pad_multiple=32)
    with pytest.raises(ValueError, match="shape"):
        tr.load_imported_params(out["params"])
