"""Utils coverage: MetricsLogger JSONL sink, Timer/throughput harness."""

import json
import os

import jax.numpy as jnp
import numpy as np

from space_time_pde_tpu.utils import MetricsLogger, Timer, throughput


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    logger.log(1, {"loss": 0.5, "reg": 0.25}, prefix="train/")
    logger.log(2, {"loss": 0.4}, prefix="train/")
    logger.close()

    path = os.path.join(str(tmp_path), "metrics.jsonl")
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[0]["step"] == 1
    assert lines[0]["train/loss"] == 0.5
    assert lines[0]["train/reg"] == 0.25
    assert "time" in lines[0]
    assert lines[1]["train/loss"] == 0.4


def test_metrics_logger_appends(tmp_path):
    MetricsLogger(str(tmp_path), use_tensorboard=False).log(1, {"a": 1.0})
    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    logger.log(2, {"a": 2.0})
    logger.close()
    path = os.path.join(str(tmp_path), "metrics.jsonl")
    assert len(open(path).readlines()) == 2


def test_timer_and_throughput():
    x = jnp.ones((64, 64))
    with Timer(sync_on=x) as t:
        y = x @ x
    assert t.seconds >= 0

    sec, result = throughput(lambda a: a @ a, x, iters=3, warmup=1)
    assert sec > 0
    np.testing.assert_allclose(np.asarray(result),
                               np.asarray(x @ x), rtol=1e-6)
