"""The built-in demo console: one self-contained HTML page served at
``GET /`` by :mod:`videoprism_tpu.serving_http`.

Zero build step, zero assets, zero JS dependencies — the page drives the
same public endpoints any client uses (``/v1/embed_file``,
``/v1/classify``, ``/v1/zero_shot``, ``/v1/search``, ``/v1/localize``,
``/v1/localize_long``, ``/v1/index/add``, the long-video sweeps) with
``fetch``, so it doubles as living documentation
of the wire protocol.  POSTs honor the optional bearer token; the page
itself is read-only static text, safe to expose wherever ``/healthz``
is.

The reference ships notebooks as its demo surface; a serving framework's
equivalent is a console on the server itself.
"""

from __future__ import annotations

CONSOLE_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>VideoPrism TPU console</title>
<style>
  :root { color-scheme: light dark; }
  body { font: 14px/1.45 system-ui, sans-serif; margin: 2rem auto;
         max-width: 46rem; padding: 0 1rem; }
  h1 { font-size: 1.3rem; } h2 { font-size: 1.05rem; margin-top: 1.6rem; }
  fieldset { border: 1px solid #8884; border-radius: 6px;
             margin: .8rem 0; padding: .8rem; }
  label { display: block; margin: .35rem 0; }
  input[type=text], textarea { width: 100%; box-sizing: border-box; }
  button { padding: .35rem .9rem; margin-top: .4rem; cursor: pointer; }
  pre { background: #8881; padding: .6rem; border-radius: 6px;
        overflow-x: auto; white-space: pre-wrap; }
  .muted { opacity: .65; }
  table { border-collapse: collapse; margin-top: .4rem; }
  td, th { border: 1px solid #8884; padding: .15rem .5rem;
           text-align: left; }
</style>
</head>
<body>
<h1>VideoPrism TPU &mdash; serving console</h1>
<p class="muted">This page drives the server's public HTTP API with
<code>fetch</code> &mdash; everything here is one <code>curl</code> away
(see <code>docs/API.md</code>).</p>

<fieldset>
  <legend>Connection</legend>
  <label>Model <select id="model"><option value="">(default)</option>
  </select></label>
  <label>Bearer token (only if the server was started with one)
    <input type="text" id="token" placeholder="leave empty for none">
  </label>
  <span id="server-info" class="muted">loading server info&hellip;</span>
</fieldset>

<fieldset>
  <legend>Video</legend>
  <label>Upload a clip (mp4/webm&hellip; &mdash; decoded server-side)
    <input type="file" id="file" accept="video/*">
  </label>
  <label>Action
    <select id="action">
      <option value="embed">Embed (/v1/embed_file)</option>
      <option value="classify">Classify (/v1/classify)</option>
      <option value="zero_shot">Zero-shot classify (/v1/zero_shot)</option>
      <option value="search_video">Find similar videos (/v1/search_video)
      </option>
      <option value="localize">Localize moments (/v1/localize)</option>
      <option value="index_add">Add to search corpus (/v1/index/add)
      </option>
      <option value="embed_long">Embed long video (/v1/embed_long)
      </option>
      <option value="classify_long">Classify long video
        (/v1/classify_long)</option>
      <option value="localize_long">Localize moments, long video
        (/v1/localize_long)</option>
    </select>
  </label>
  <label id="classes-row" style="display:none">Class names /
    localization queries (one per line)
    <textarea id="classes" rows="3">drumming on a bottle
swimming in the sea</textarea>
  </label>
  <label id="async-row" style="display:none">
    <input type="checkbox" id="async"> Run as async job
    (<code>/v1/jobs</code> — submit, poll, fetch)
  </label>
  <button id="run">Run</button>
</fieldset>

<fieldset>
  <legend>Text &rarr; video search</legend>
  <label>Query <input type="text" id="query"
    placeholder="a person playing drums"></label>
  <button id="search">Search (/v1/search)</button>
</fieldset>

<h2>Result</h2>
<pre id="out" class="muted">&mdash;</pre>

<script>
'use strict';
const $ = (id) => document.getElementById(id);
const out = (x, cls) => {
  $('out').textContent = typeof x === 'string' ? x
      : JSON.stringify(x, null, 2);
  $('out').className = cls || '';
};
const modelPath = (ep) => {
  const m = $('model').value;
  return m ? `/v1/models/${m}/${ep}` : `/v1/${ep}`;
};
const headers = (ct) => {
  const h = {'Content-Type': ct};
  if ($('token').value) h['Authorization'] = 'Bearer ' + $('token').value;
  return h;
};
async function jfetch(url, opts) {
  const r = await fetch(url, opts);
  const text = await r.text();
  let body; try { body = JSON.parse(text); } catch (e) { body = text; }
  if (!r.ok) throw new Error(`HTTP ${r.status}: ` +
      (body && body.error ? body.error : text.slice(0, 300)));
  return body;
}

(async () => {
  try {
    const [models, stats] = await Promise.all([
      jfetch('/v1/models'), jfetch('/stats')]);
    for (const m of models.models) {
      const o = document.createElement('option');
      o.value = m.default ? '' : m.name;
      o.textContent = `${m.name} (${m.kind}` +
          (m.text ? ', text' : '') + (m.search ? ', search' : '') + ')';
      $('model').appendChild(o);
    }
    const served = stats.requests_served ?? Object.values(
        stats.models || {})[0]?.requests_served ?? 0;
    $('server-info').textContent =
        `${models.models.length} model(s), ${served} requests served`;
  } catch (e) { $('server-info').textContent = 'server info: ' + e; }
})();

const LONG_KINDS = ['classify_long', 'embed_long', 'localize_long'];
$('action').addEventListener('change', () => {
  const a = $('action').value;
  $('classes-row').style.display =
      (a === 'zero_shot' || a === 'localize' || a === 'localize_long')
      ? '' : 'none';
  $('async-row').style.display = LONG_KINDS.includes(a) ? '' : 'none';
});

async function runJob(kind, query, body) {
  const sub = await jfetch(modelPath(`jobs?kind=${kind}` + query),
      {method: 'POST', headers: headers('video/mp4'), body});
  out(`job ${sub.job} submitted; polling…`, 'muted');
  for (;;) {
    await new Promise((r) => setTimeout(r, 1500));
    const st = await jfetch(`/v1/jobs/${sub.job}`, {headers: headers('')});
    if (st.state === 'done') break;
    if (st.state === 'error' || st.state === 'cancelled') {
      throw new Error(`job ${st.state}: ${st.error || ''}`);
    }
    let prog = '';
    if (st.progress) {
      prog = st.progress.total
          ? ` [${st.progress.done}/${st.progress.total} windows` +
            ` ${Math.round(100 * st.progress.done / st.progress.total)}%]`
          : ` [${st.progress.done} windows]`;
    }
    out(`job ${sub.job}: ${st.state}${prog}…`, 'muted');
  }
  const r = await fetch(`/v1/jobs/${sub.job}/result`,
      {headers: headers('')});
  if (!r.ok) throw new Error('HTTP ' + r.status + ': ' + await r.text());
  if ((r.headers.get('Content-Type') || '').includes('json')) {
    out(await r.json());
  } else {
    const buf = new Uint8Array(await r.arrayBuffer());
    out(`job result: ${buf.length} npy bytes — parse with numpy`);
  }
}

$('run').addEventListener('click', async () => {
  const f = $('file').files[0];
  if (!f) { out('choose a video file first'); return; }
  out('running…', 'muted');
  const body = await f.arrayBuffer();
  const lines = $('classes').value.split('\\n').map(
      (s) => s.trim()).filter(Boolean);
  try {
    const a = $('action').value;
    if (a === 'embed') {
      const r = await fetch(modelPath('embed_file?dtype=float16'),
          {method: 'POST', headers: headers('video/mp4'), body});
      if (!r.ok) throw new Error('HTTP ' + r.status + ': ' +
          await r.text());
      const buf = new Uint8Array(await r.arrayBuffer());
      out(`embedding: ${buf.length} npy bytes (float16) — parse ` +
          'with numpy; this console just confirms the round trip');
    } else if (a === 'classify') {
      out(await jfetch(modelPath('classify?k=5'),
          {method: 'POST', headers: headers('video/mp4'), body}));
    } else if (a === 'zero_shot') {
      if (!lines.length) throw new Error('enter class names');
      const reg = await jfetch(modelPath('zero_shot/classes'), {
          method: 'POST', headers: headers('application/json'),
          body: JSON.stringify({classes: lines})});
      out(await jfetch(modelPath(`zero_shot?set=${reg.set}&k=5`),
          {method: 'POST', headers: headers('video/mp4'), body}));
    } else if (a === 'search_video') {
      out(await jfetch(modelPath('search_video?k=5'),
          {method: 'POST', headers: headers('video/mp4'), body}));
    } else if (a === 'localize') {
      if (!lines.length) throw new Error('enter localization queries');
      const q = lines.map((s) => 'q=' + encodeURIComponent(s)).join('&');
      out(await jfetch(modelPath('localize?' + q),
          {method: 'POST', headers: headers('video/mp4'), body}));
    } else if (a === 'index_add') {
      out(await jfetch(modelPath('index/add?id=' +
          encodeURIComponent(f.name)),
          {method: 'POST', headers: headers('video/mp4'), body}));
    } else if (a === 'embed_long') {
      if ($('async').checked) { await runJob(a, '&dtype=float16', body);
                                return; }
      const r = await fetch(modelPath('embed_long?dtype=float16'),
          {method: 'POST', headers: headers('video/mp4'), body});
      if (!r.ok) throw new Error('HTTP ' + r.status + ': ' +
          await r.text());
      const buf = new Uint8Array(await r.arrayBuffer());
      out(`long-video embedding: ${buf.length} npy bytes (float16) — ` +
          'every frame swept in windows, not subsampled');
    } else if (a === 'classify_long') {
      if ($('async').checked) { await runJob(a, '&k=5', body); return; }
      out(await jfetch(modelPath('classify_long?k=5'),
          {method: 'POST', headers: headers('video/mp4'), body}));
    } else if (a === 'localize_long') {
      if (!lines.length) throw new Error('enter localization queries');
      const q = lines.map((s) => 'q=' + encodeURIComponent(s)).join('&');
      if ($('async').checked) { await runJob(a, '&k=3&' + q, body);
                                return; }
      out(await jfetch(modelPath('localize_long?' + q + '&k=3'),
          {method: 'POST', headers: headers('video/mp4'), body}));
    }
  } catch (e) { out(String(e)); }
});

$('search').addEventListener('click', async () => {
  const q = $('query').value.trim();
  if (!q) { out('enter a query'); return; }
  out('searching…', 'muted');
  try {
    out(await jfetch(modelPath('search'), {
        method: 'POST', headers: headers('application/json'),
        body: JSON.stringify({texts: [q], k: 5})}));
  } catch (e) { out(String(e)); }
});
</script>
</body>
</html>
"""
