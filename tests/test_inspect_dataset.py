"""Dataset health sweep CLI (scripts/inspect_dataset.py)."""

import json
import os
import pathlib
import subprocess
import sys

import pytest

from videoprism_tpu import assets

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _run(tmp_path, manifest_lines, extra=()):
  manifest = tmp_path / 'data.csv'
  manifest.write_text('\n'.join(manifest_lines) + '\n')
  out = tmp_path / 'report.json'
  env = dict(os.environ)
  env['PYTHONPATH'] = str(ROOT) + os.pathsep + env.get('PYTHONPATH', '')
  r = subprocess.run(
      [sys.executable, str(ROOT / 'scripts' / 'inspect_dataset.py'),
       '--manifest', str(manifest), '--num-frames', '4',
       '--frame-size', '64', '--json-out', str(out), *extra],
      capture_output=True, text=True, env=env, timeout=300)
  report = json.load(open(out)) if out.exists() else None
  return r, report


def test_clean_corpus_exits_zero(tmp_path):
  demo = assets.demo_video_path()
  r, report = _run(tmp_path, [f'{demo},a drummer', f'{demo},water bottle'])
  assert r.returncode == 0, r.stdout + r.stderr
  assert report['decode_failures'] == 0
  assert report['examples_inspected'] == 2
  assert list(report['shapes']) == ['(4, 64, 64, 3)']
  assert report['caption_words']['mean'] > 0
  lo, hi = report['pixel_range']
  assert 0.0 <= lo <= hi <= 1.0


def test_broken_file_reported_and_exit_one(tmp_path):
  demo = assets.demo_video_path()
  r, report = _run(tmp_path,
                   [f'{demo},fine', '/nonexistent/broken.mp4,bad'])
  assert r.returncode == 1
  assert report['decode_failures'] == 1
  assert report['failures'][0]['id'] == '/nonexistent/broken.mp4'
  assert 'broken.mp4' in r.stdout


def test_labeled_histogram(tmp_path):
  demo = assets.demo_video_path()
  r, report = _run(tmp_path, [f'{demo},0', f'{demo},1', f'{demo},1'],
                   extra=('--labeled',))
  assert r.returncode == 0, r.stdout + r.stderr
  assert report['label_histogram'] == {'0': 1, '1': 2}
  assert report['num_classes_seen'] == 2
