#!/usr/bin/env python
"""End-to-end vector-database walkthrough: serve an empty mutable
corpus, fill it over the wire, search it, persist it.

The serving process IS the database: ``serve_embeddings --index
new[-ann] --index-save-path corpus.npz`` exposes CRUD
(``/v1/index/add|remove|save``) next to search, clips embed through the
same tower queries score against, and a SIGTERM autosaves.

Run (CPU, tiny random weights — the flow, not the semantics)::

    python examples/vector_database.py

Production shape: drop ``--tiny-clip --cpu-devices`` for the real lvt
checkpoint on the TPU, pass real mp4s to ``index_add_file``, and point
``--index`` at an offline-built corpus (scripts/build_video_index.py)
to start from an existing collection.
"""

import os
import signal
import subprocess
import sys
import tempfile
import time
import urllib.request

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
  if '--help' in sys.argv or '-h' in sys.argv:
    print(__doc__)
    return

  from videoprism_tpu import retrieval
  from videoprism_tpu.client import VideoPrismClient

  save_path = os.path.join(tempfile.mkdtemp(prefix='vp_vdb_'),
                           'corpus.npz')
  env = dict(os.environ)
  env['PYTHONPATH'] = ROOT + os.pathsep + env.get('PYTHONPATH', '')
  server = subprocess.Popen(
      [sys.executable, '-u',
       os.path.join(ROOT, 'scripts', 'serve_embeddings.py'),
       '--tiny-clip', '--cpu-devices', '1', '--port', '0',
       '--index', 'new', '--index-save-path', save_path],
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
    rng = np.random.default_rng(0)
    library = {name: (rng.random((2, 12, 12, 3)) * 255).astype(np.uint8)
               for name in ('sunrise', 'drumming', 'ocean')}

    # CREATE: each clip embeds server-side and is searchable at once.
    for name, clip in library.items():
      client.index_add(clip, id=name)
    print(f'added {len(library)} clips')

    # READ: video-to-video search (text search needs real lvt weights).
    hits = client.search_video(library['drumming'], k=2)
    print('nearest to "drumming":', hits)
    assert hits[0][0] == 'drumming'

    # DELETE: gone from the next search.
    client.index_remove(['sunrise'])
    print('removed "sunrise";',
          [i for i, _ in client.search_video(library['sunrise'], k=3)])

    # PERSIST: atomic save; load_index reopens it anywhere.
    print('saved:', client.index_save())
    print('reloaded ids:', sorted(retrieval.load_index(save_path).ids))
  finally:
    server.send_signal(signal.SIGTERM)  # drains + autosaves too
    server.wait(timeout=120)
  print('OK')


if __name__ == '__main__':
  main()
