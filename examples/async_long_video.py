#!/usr/bin/env python
"""Async long-video jobs walkthrough: submit a sweep, poll, fetch.

The synchronous long-video endpoints hold an HTTP connection open for
the whole sweep; the job tier (``/v1/jobs``) answers immediately and
runs the sweep on the server's worker — the production pattern for
videos measured in minutes or hours:

1. ``POST /v1/jobs?kind=classify_long&...`` with the mp4 body → job id.
2. ``GET /v1/jobs/<id>`` until ``state == done`` (or error/cancelled).
3. ``GET /v1/jobs/<id>/result`` — the sync endpoint's exact bytes.

Run (CPU, tiny random weights — the flow, not the semantics)::

    python examples/async_long_video.py

Production shape: drop ``--tiny --cpu-devices`` for a real classifier
checkpoint on the TPU (``--num-classes``), raise ``job_ttl_s`` to your
result-retention window, and watch
``videoprism_jobs_state{state="queued"}`` on ``/metrics``.
"""

import json
import os
import subprocess
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
  if '--help' in sys.argv or '-h' in sys.argv:
    print(__doc__)
    return

  from videoprism_tpu import assets
  from videoprism_tpu.client import VideoPrismClient

  env = dict(os.environ)
  env['PYTHONPATH'] = ROOT + os.pathsep + env.get('PYTHONPATH', '')
  server = subprocess.Popen(
      [sys.executable, '-u',
       os.path.join(ROOT, 'scripts', 'serve_embeddings.py'),
       '--tiny', '--num-classes', '4', '--cpu-devices', '1',
       '--port', '0'],
      stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
      env=env)
  try:
    port = None
    while port is None:
      line = server.stdout.readline()
      if not line:
        raise RuntimeError('server exited early')
      if line.startswith('serving on'):
        port = int(line.split(':')[2].split(' ')[0].split('(')[0]
                   .strip('/ '))
    for _ in range(300):
      try:
        urllib.request.urlopen(f'http://127.0.0.1:{port}/healthz',
                               timeout=5)
        break
      except Exception:
        time.sleep(0.1)

    client = VideoPrismClient(f'http://127.0.0.1:{port}')
    video = assets.demo_video_path()

    # 1. Submit: the reply is immediate — no connection held open.
    job = client.submit_job('classify_long', video, k=3, window=2,
                            size=12)
    print(f'submitted job {job}')

    # 2. Poll until done (wait_job wraps this loop; shown unrolled).
    # A running sweep reports live window progress, and POST
    # /v1/jobs/<id>/cancel would interrupt it at the next window
    # boundary (state 'cancelling' -> 'cancelled').
    while True:
      status = client.job_status(job)
      prog = status.get('progress')
      bar = (f' {prog["done"]}/{prog["total"] or "?"} windows'
             if prog else '')
      print(f'  state={status["state"]}{bar}')
      if status['state'] in ('done', 'error', 'cancelled'):
        break
      time.sleep(0.5)
    assert status['state'] == 'done', status
    print(f'ran in {status["runtime_s"]}s, '
          f'{status["result_bytes"]} result bytes')

    # 3. Fetch: exactly what POST /v1/classify_long would have replied.
    preds = json.loads(client.job_result(job))['predictions']
    print('top prediction:', preds[0])

    # The listing shows retained jobs + counters (ops surface).
    listing = client.list_jobs()
    print(f'{len(listing["jobs"])} retained job(s), '
          f'{listing["jobs_run"]} run, {listing["jobs_failed"]} failed')
  finally:
    server.terminate()
    server.wait(timeout=30)
  print('OK')


if __name__ == '__main__':
  main()
