"""Structured metrics logger: JSONL sink, scalarization, events."""

import json

import jax.numpy as jnp
import numpy as np

from videoprism_tpu.utils.logging import MetricsLogger


class TestMetricsLogger:

  def test_jsonl_sink_and_scalarization(self, tmp_path):
    with MetricsLogger(str(tmp_path), console_every=100) as logger:
      logger.log(0, {'loss': jnp.asarray(1.5), 'acc': 0.25})
      logger.log(1, {'loss': jnp.asarray(1.25),
                     'grad_norm': np.float32(3.0)},
                 lr=1e-4)
      logger.event('checkpoint_saved', step=1)

    lines = [json.loads(l) for l in
             (tmp_path / 'metrics.jsonl').read_text().splitlines()]
    assert len(lines) == 3
    assert lines[0]['step'] == 0 and lines[0]['loss'] == 1.5
    assert isinstance(lines[0]['loss'], float)  # device array -> scalar
    assert lines[1]['lr'] == 1e-4
    assert lines[1]['grad_norm'] == 3.0
    assert 'steps_per_sec' in lines[1]
    assert lines[2]['event'] == 'checkpoint_saved'

  def test_append_across_restarts(self, tmp_path):
    with MetricsLogger(str(tmp_path)) as logger:
      logger.log(0, {'loss': 1.0})
    with MetricsLogger(str(tmp_path)) as logger:  # resume
      logger.log(1, {'loss': 0.9})
    lines = (tmp_path / 'metrics.jsonl').read_text().splitlines()
    assert len(lines) == 2

  def test_no_directory_console_only(self, capsys):
    logger = MetricsLogger(None, console_every=1)
    logger.log(0, {'loss': 2.0})
    assert 'loss 2.0000' in capsys.readouterr().out
    logger.close()
