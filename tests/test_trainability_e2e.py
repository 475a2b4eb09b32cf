"""End-to-end trainability demo (VERDICT r4 #9): the full training LOOP
— file decode, loader, gradient accumulation, checkpointing, in-loop
retrieval eval — trains lvt-tiny to perfect retrieval on a real
(video file, caption) corpus through the actual train_clip.py CLI.

The loss-decrease tests prove the STEPS work; this proves the loop
trains something to completion: 4 distinct synthesized clips + 4
captions, overfit to t2v/v2t R@1 = 1.0."""

import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

_ROOT = pathlib.Path(__file__).resolve().parent.parent


def _write_corpus(root: pathlib.Path) -> tuple[str, str, str]:
  cv2 = pytest.importorskip('cv2')
  captions = ['a person drumming loudly', 'blue ocean waves',
              'green forest walk', 'bright white snow field']
  for i in range(4):
    w = cv2.VideoWriter(str(root / f'clip{i}.mp4'),
                        cv2.VideoWriter_fourcc(*'mp4v'), 8, (32, 32))
    base = np.zeros((32, 32, 3), np.uint8)
    base[..., i % 3] = 200
    if i == 3:
      base[:16] = 255
    for t in range(6):
      frame = base.copy()
      frame[t * 4:t * 4 + 4, :, :] = (i * 60) % 255
      w.write(frame)
    w.release()
  (root / 'captions.txt').write_text('\n'.join(captions) + '\n')
  manifest = root / 'manifest.tsv'
  manifest.write_text(''.join(
      f'{root}/clip{i}.mp4\t{cap}\n' for i, cap in enumerate(captions)))
  return (str(root / '*.mp4'), str(root / 'captions.txt'), str(manifest))


@pytest.mark.slow
def test_overfit_to_perfect_retrieval_via_cli(tmp_path):
  glob_pat, captions, manifest = _write_corpus(tmp_path)
  ckpt_dir = tmp_path / 'ck'
  env = dict(os.environ)
  env['PYTHONPATH'] = str(_ROOT) + os.pathsep + env.get('PYTHONPATH', '')
  res = subprocess.run(
      [sys.executable, str(_ROOT / 'scripts' / 'train_clip.py'),
       '--tiny', '--videos-glob', glob_pat, '--captions', captions,
       '--eval-manifest', manifest, '--steps', '80', '--eval-every', '40',
       '--batch-size', '2', '--accum-steps', '2',
       '--learning-rate', '3e-3', '--warmup-steps', '2',
       '--checkpoint-dir', str(ckpt_dir), '--checkpoint-every', '40',
       '--cpu-devices', '1'],
      capture_output=True, text=True, timeout=280, env=env)
  assert res.returncode == 0, res.stdout[-1500:] + res.stderr[-800:]

  # The loop's own log is the record: the final in-loop retrieval eval
  # must be perfect on the training pairs.
  logs = list(ckpt_dir.glob('*.jsonl'))
  assert logs, list(ckpt_dir.iterdir())
  evals = [json.loads(ln) for ln in logs[0].read_text().splitlines()
           if '"eval"' in ln]
  assert evals, 'no eval events logged'
  final = evals[-1]
  assert final['t2v_recall@1'] == 1.0, final
  assert final['v2t_recall@1'] == 1.0, final
  assert final['num_pairs'] == 4.0
  # The loop checkpointed (orbax step dirs exist beside the log).
  assert any(p.is_dir() for p in ckpt_dir.iterdir()), \
      list(ckpt_dir.iterdir())
