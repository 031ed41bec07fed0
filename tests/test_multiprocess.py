"""Multi-process (multi-host analog) distributed training validation.

Spawns 2 jax.distributed processes (CPU, 4 virtual devices each -> one global
8-device mesh) and checks, against a single-process 8-device run:
  * per-process loader shards are disjoint and cover the epoch
    (DistributedSampler analog, loader.py process-strided indices);
  * the global-batch training loss matches the single-process loss on the
    same global batch (reference DDP all-reduce semantics,
    utils/misc.py:436-458).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["MFL_REPO"])

from multimodal_feature_learning_tpu.parallel.mesh import (
    maybe_initialize_distributed, make_mesh, replicate_params, shard_batch,
)
maybe_initialize_distributed()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np
from multimodal_feature_learning_tpu.data.anet import ActivityNetDataset, FeatureBackend
from multimodal_feature_learning_tpu.data.loader import DataLoader, split_batch
from multimodal_feature_learning_tpu.data.vocab import build_vocab
from multimodal_feature_learning_tpu.engine.state import create_train_state, make_optimizer
from multimodal_feature_learning_tpu.engine.train import make_train_step
from multimodal_feature_learning_tpu.models.criterion import SetCriterion, build_weight_dict
from multimodal_feature_learning_tpu.models.dvc import build_model

sys.path.insert(0, os.path.join(os.environ["MFL_REPO"], "tests"))
from test_batch_padding import small_cfg

with open(os.environ["MFL_ANN"]) as f:
    ann = json.load(f)
cfg = small_cfg()
cfg.batch_size = 4  # per-process batch -> global batch 8 over the 8-dev mesh
vocab = build_vocab(ann, min_freq=1)
features = FeatureBackend("", feature_dim=cfg.dvc.detr.feature_dim, synthetic_len=40)
ds = ActivityNetDataset(os.environ["MFL_ANN"], features, vocab, is_training=True,
                        max_gt_target_segments=4, max_caption_len=8)
loader = DataLoader(ds, cfg.batch_size, vocab.pad_idx, video_rescale_len=24,
                    max_gt=4, max_caption_len=8, shuffle=False)

batch = next(iter(loader))
arrays, meta = split_batch(batch)

mesh = make_mesh()
model = build_model(cfg, len(vocab), vocab.pad_idx, vocab.bos_idx, vocab.eos_idx)
params = model.init(jax.random.PRNGKey(0), arrays)
params = replicate_params(params, mesh)

weight_dict = build_weight_dict(cfg)
criterion = SetCriterion(num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
                         losses=["labels", "segments", "captions", "contexts",
                                 "mask_prediction"],
                         pad_idx=vocab.pad_idx, smoothing=cfg.dvc.smoothing)
tx = make_optimizer(cfg, steps_per_epoch=10)
state = create_train_state(params, tx)
train_step = make_train_step(model, criterion, weight_dict, tx)

sharded = shard_batch(arrays, mesh)
state, metrics, _ = train_step(state, sharded, jax.random.PRNGKey(1))

result = {
    "process": jax.process_index(),
    "keys": meta["keys"],
    "loss": float(metrics["loss"]),
    "grad_norm": float(metrics["grad_norm"]),
}
print("RESULT " + json.dumps(result), flush=True)
"""


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    # tiny world shared by workers and the in-process single run
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_batch_padding import make_annotations, small_cfg

    ann = make_annotations(n=16, seed=0)
    ann_path = tmp_path / "train.json"
    ann_path.write_text(json.dumps(ann))
    worker_path = tmp_path / "worker.py"
    worker_path.write_text(WORKER)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            MFL_REPO=REPO,
            MFL_ANN=str(ann_path),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )

    results = {}
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["process"]] = r

    # (a) disjoint per-process shards covering the head of the epoch
    keys0, keys1 = results[0]["keys"], results[1]["keys"]
    assert not set(keys0) & set(keys1)
    expected = [f"v_{i:04d}" for i in range(8)]
    assert sorted(keys0 + keys1) == sorted(expected)
    # process-strided: proc0 gets even indices, proc1 odd (loader.py:75-77)
    assert keys0 == [f"v_{i:04d}" for i in (0, 2, 4, 6)]
    assert keys1 == [f"v_{i:04d}" for i in (1, 3, 5, 7)]

    # both processes computed the SAME global loss (one XLA program over the
    # global mesh; the reference needs an explicit all_reduce for this)
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["grad_norm"] == pytest.approx(results[1]["grad_norm"], rel=1e-5)

    # (b) equals the single-process 8-device loss on the same global batch
    from multimodal_feature_learning_tpu.data.anet import (
        ActivityNetDataset, FeatureBackend, collate_fixed,
    )
    from multimodal_feature_learning_tpu.data.loader import split_batch
    from multimodal_feature_learning_tpu.data.vocab import build_vocab
    import jax

    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state, make_optimizer,
    )
    from multimodal_feature_learning_tpu.engine.train import make_train_step
    from multimodal_feature_learning_tpu.models.criterion import (
        SetCriterion, build_weight_dict,
    )
    from multimodal_feature_learning_tpu.models.dvc import build_model
    from multimodal_feature_learning_tpu.parallel.mesh import (
        make_mesh, replicate_params, shard_batch,
    )

    cfg = small_cfg()
    vocab = build_vocab(ann, min_freq=1)
    features = FeatureBackend("", feature_dim=cfg.dvc.detr.feature_dim, synthetic_len=40)
    ds = ActivityNetDataset(str(ann_path), features, vocab, is_training=True,
                            max_gt_target_segments=4, max_caption_len=8)
    # global batch row order = [proc0 shard; proc1 shard] (mesh device order)
    order = [0, 2, 4, 6, 1, 3, 5, 7]
    samples = [ds[i] for i in order]
    batch = collate_fixed(samples, vocab.pad_idx, video_rescale_len=24,
                          max_gt=4, max_caption_len=8)
    arrays, _ = split_batch(batch)

    mesh = make_mesh()
    model = build_model(cfg, len(vocab), vocab.pad_idx, vocab.bos_idx, vocab.eos_idx)
    params = model.init(jax.random.PRNGKey(0), arrays)
    params = replicate_params(params, mesh)
    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
                             losses=["labels", "segments", "captions", "contexts",
                                     "mask_prediction"],
                             pad_idx=vocab.pad_idx, smoothing=cfg.dvc.smoothing)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(params, tx)
    train_step = make_train_step(model, criterion, weight_dict, tx)
    _, metrics, _ = train_step(state, shard_batch(arrays, mesh), jax.random.PRNGKey(1))

    single_loss = float(metrics["loss"])
    assert results[0]["loss"] == pytest.approx(single_loss, rel=2e-4), (
        results[0]["loss"], single_loss,
    )
