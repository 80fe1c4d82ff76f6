/* Dream Lab TPU web UI.
 *
 * Dependency-free rebuild of the reference's React chat UI
 * (lcm-sr-ui/): chat-style generation with a params panel, server-side
 * image keys (X-LCM-Image-Key -> /storage/{key}), multi-backend
 * round-robin, PNG tEXt parameter restore on drag-drop, superres upload,
 * mode switching, and a Dreams tab over /dreams/*.
 */
"use strict";

// ---------------------------------------------------------------------------
// API: round-robin over base URLs (reference api.js:77-91)
// ---------------------------------------------------------------------------

const API_BASES = (window.API_BASES || [""]).slice();
let rrIndex = 0;
function apiBase() {
  const base = API_BASES[rrIndex % API_BASES.length];
  rrIndex += 1;
  return base;
}
async function api(path, opts) {
  return fetch(apiBase() + path, opts);
}

// ---------------------------------------------------------------------------
// AbortController manager (reference api.js:307-420): every long-running
// fetch registers a controller; superseding requests and tab close abort
// in-flight work, which closes the connection and triggers the SERVER's
// queued-job disconnect-cancellation (serving/app.py _await_future).
// ---------------------------------------------------------------------------

const inflightControllers = new Set();
function makeController() {
  const ctrl = new AbortController();
  inflightControllers.add(ctrl);
  return ctrl;
}
function releaseController(ctrl) {
  inflightControllers.delete(ctrl);
}
function abortAll() {
  for (const c of inflightControllers) c.abort();
  inflightControllers.clear();
}
// tab close / navigation: cancel everything still queued server-side
window.addEventListener("pagehide", abortAll);

// ---------------------------------------------------------------------------
// helpers
// ---------------------------------------------------------------------------

const $ = (id) => document.getElementById(id);
function el(tag, cls, text) {
  const e = document.createElement(tag);
  if (cls) e.className = cls;
  if (text !== undefined) e.textContent = text;
  return e;
}
function setStatus(msg, isError) {
  const s = $("status");
  s.textContent = msg || "";
  s.classList.toggle("error", !!isError);
}

// PNG tEXt parser (reference pngMeta.js:66-105)
function parsePngText(buf) {
  const dv = new DataView(buf);
  const out = {};
  if (dv.getUint32(0) !== 0x89504e47) return out;
  let off = 8;
  while (off + 8 <= buf.byteLength) {
    const len = dv.getUint32(off);
    // malformed/truncated chunk: a declared length past the buffer end
    // would make the Uint8Array view below throw RangeError and kill the
    // drop handler — stop parsing instead
    if (off + 8 + len > buf.byteLength) return out;
    const type = String.fromCharCode(
      dv.getUint8(off + 4), dv.getUint8(off + 5),
      dv.getUint8(off + 6), dv.getUint8(off + 7));
    if (type === "tEXt") {
      const bytes = new Uint8Array(buf, off + 8, len);
      const zero = bytes.indexOf(0);
      if (zero > 0) {
        const dec = new TextDecoder("latin1");
        out[dec.decode(bytes.subarray(0, zero))] =
          dec.decode(bytes.subarray(zero + 1));
      }
    }
    if (type === "IEND") break;
    off += 12 + len;
  }
  return out;
}

// "prompt\nSteps: 4, CFG scale: 1, Seed: 7, Size: 512x512"
function applyA1111Params(text) {
  const lines = text.split("\n");
  $("prompt").value = lines[0] || "";
  const kv = {};
  (lines[1] || "").split(",").forEach((part) => {
    const m = part.split(":");
    if (m.length === 2) kv[m[0].trim().toLowerCase()] = m[1].trim();
  });
  if (kv["steps"]) $("p-steps").value = kv["steps"];
  if (kv["cfg scale"]) $("p-cfg").value = kv["cfg scale"];
  if (kv["seed"]) $("p-seed").value = kv["seed"];
  if (kv["size"]) $("p-size").value = kv["size"];
}

// ---------------------------------------------------------------------------
// IndexedDB blob cache (reference cache.js:19-110): djb2 key over normalized
// params; seeded, deterministic requests short-circuit the server entirely.
// ---------------------------------------------------------------------------

const CACHE_DB = "dreamlab-image-cache";
const CACHE_STORE = "images";
const CACHE_MAX = 50;
let cacheDb = null;

function openCache() {
  return new Promise((resolve) => {
    if (cacheDb) return resolve(cacheDb);
    if (!window.indexedDB) return resolve(null);
    const req = indexedDB.open(CACHE_DB, 1);
    req.onupgradeneeded = () => {
      const store = req.result.createObjectStore(CACHE_STORE, { keyPath: "key" });
      store.createIndex("at", "at");
    };
    req.onsuccess = () => { cacheDb = req.result; resolve(cacheDb); };
    req.onerror = () => resolve(null);
  });
}

function cacheKey(params) {
  const normalized = {
    p: String(params.prompt || "").trim().toLowerCase(),
    sz: String(params.size || "512x512"),
    st: Number(params.num_inference_steps) || 0,
    cfg: Number(params.guidance_scale) || 0,
    sd: Number(params.seed) || 0,
    sr: params.superres ? Number(params.superres_magnitude) || 1 : 0,
    srf: params.superres ? `${params.superres_format || "png"}:${params.superres_quality || 92}` : "",
    neg: String(params.negative_prompt || ""),
    sty: params.style_lora ? `${params.style_lora.style}:${params.style_lora.level}` : "",
    md: String(params.mode || ""),
  };
  const str = JSON.stringify(normalized);
  let hash = 5381; // djb2 (reference cache.js:46-56)
  for (let i = 0; i < str.length; i++) {
    hash = ((hash << 5) + hash) ^ str.charCodeAt(i);
  }
  return (hash >>> 0).toString(16).padStart(8, "0");
}

async function cacheGet(key) {
  const db = await openCache();
  if (!db) return null;
  return new Promise((resolve) => {
    const tx = db.transaction(CACHE_STORE, "readonly");
    const req = tx.objectStore(CACHE_STORE).get(key);
    req.onsuccess = () => resolve(req.result || null);
    req.onerror = () => resolve(null);
  });
}

async function cachePut(key, blob, meta) {
  const db = await openCache();
  if (!db) return;
  const tx = db.transaction(CACHE_STORE, "readwrite");
  const store = tx.objectStore(CACHE_STORE);
  store.put({ key, blob, meta, at: Date.now() });
  // evict oldest beyond the cap
  const count = store.count();
  count.onsuccess = () => {
    let extra = count.result - CACHE_MAX;
    if (extra <= 0) return;
    store.index("at").openCursor().onsuccess = (e) => {
      const cur = e.target.result;
      if (cur && extra-- > 0) { cur.delete(); cur.continue(); }
    };
  };
}

// ---------------------------------------------------------------------------
// latent exploration presets (reference useLatentExploration.js:27-77):
// LCM-specific recipes driving /generate; steps 0 ("latent lock") clamps to
// the server minimum of 1, passCount reruns the recipe with the same seed.
// ---------------------------------------------------------------------------

const LATENT_PRESETS = {
  LATENT_LOCK: { name: "Latent Lock", steps: 0, cfg: 8.0, denoise: 1.0, passCount: 1 },
  COUSINS_DETAILED: { name: "Latent Cousins (Detailed)", steps: 10, cfg: 0.0, denoise: 0.7, passCount: 1 },
  COUSINS_SUBTLE: { name: "Latent Cousins (Subtle)", steps: 7, cfg: 0.0, denoise: 0.5, passCount: 1 },
  COUSINS_WILD: { name: "Latent Cousins (Wild)", steps: 15, cfg: 0.0, denoise: 0.9, passCount: 2 },
  PROGRESSIVE: { name: "Progressive Refinement", steps: 8, cfg: 0.5, denoise: 0.8, passCount: 3 },
};

async function img2imgPass(blob, { prompt, steps, cfg, denoise, seed, label }) {
  const form = new FormData();
  form.append("file", blob, "pass.png");
  form.append("prompt", prompt);
  form.append("strength", String(denoise));
  form.append("steps", String(steps));
  form.append("guidance", String(cfg));
  form.append("seed", String(seed));
  addMessage("user", `[${label}] ${prompt}`);
  const pending = addMessage("bot pending", "refining…");
  const ctrl = makeController();
  try {
    const resp = await api("/v1/img2img", {
      method: "POST", body: form, signal: ctrl.signal,
    });
    if (!resp.ok) throw new Error("HTTP " + resp.status);
    const out = await resp.blob();
    const meta = { prompt, seed: resp.headers.get("X-Seed"), size: $("p-size").value };
    pending.replaceChildren(imageCard(URL.createObjectURL(out), meta));
    pending.className = "msg bot";
    return out;
  } catch (e) {
    pending.replaceChildren(el("div", "text error", "✗ " + e.message));
    pending.className = "msg bot";
    return null;
  } finally {
    releaseController(ctrl);
  }
}

async function runPreset(presetId) {
  const preset = LATENT_PRESETS[presetId];
  if (!preset) return;
  const seed = $("p-seed").value !== ""
    ? +$("p-seed").value
    : eightDigitSeed();
  $("p-seed").value = seed; // lock the seed across passes
  const steps = Math.max(1, preset.steps);
  // pass 1 establishes the latent; passes 2..N re-enter the ladder via
  // img2img at the preset's denoise strength (the reference's multi-pass
  // recipes chain the previous output, useLatentExploration.js:27-77)
  let blob = await generate({
    num_inference_steps: steps,
    guidance_scale: preset.cfg,
    seed,
    _label: `${preset.name} 1/${preset.passCount}`,
  });
  const prompt = $("prompt").value.trim();
  for (let pass = 1; pass < preset.passCount && blob; pass++) {
    blob = await img2imgPass(blob, {
      prompt, steps, cfg: preset.cfg, denoise: preset.denoise,
      seed: seed + pass,
      label: `${preset.name} ${pass + 1}/${preset.passCount}`,
    });
  }
}

// ---------------------------------------------------------------------------
// client-side dream mode (reference useImageGeneration.js:22-99): interval
// loop mutating the prompt with a modifier vocabulary and jittering params.
// ---------------------------------------------------------------------------

const DREAM_MODIFIERS = [
  "dramatic lighting", "soft lighting", "golden hour", "rim light",
  "volumetric light", "backlighting", "studio lighting", "natural light",
  "misty", "foggy", "hazy", "atmospheric", "ethereal", "moody",
  "wide angle", "telephoto", "shallow depth of field", "bokeh",
  "cinematic composition", "rule of thirds", "symmetrical", "dynamic angle",
  "highly detailed", "painterly", "photorealistic", "stylized",
  "film grain", "vintage", "modern", "minimalist",
  "warm tones", "cool tones", "vibrant colors", "muted colors",
  "monochromatic", "high contrast", "desaturated",
  "intricate details", "sharp focus", "soft focus", "textured",
];

function eightDigitSeed() {
  return 10000000 + Math.floor(Math.random() * 90000000);
}

function dreamVariation(basePrompt, temperature) {
  const numMods = Math.floor(Math.random() * (1 + temperature * 3)) + 1;
  const available = DREAM_MODIFIERS.slice();
  const mods = [];
  for (let i = 0; i < numMods && available.length; i++) {
    mods.push(available.splice(Math.floor(Math.random() * available.length), 1)[0]);
  }
  return mods.length ? `${basePrompt.trim()}, ${mods.join(", ")}` : basePrompt.trim();
}

function mutateParams(temperature) {
  const out = { seed: eightDigitSeed() };
  const steps = +$("p-steps").value || 4;
  const cfg = +$("p-cfg").value || 1;
  if (Math.random() < temperature) {
    const delta = Math.floor(steps * 0.2 * (Math.random() - 0.5));
    out.num_inference_steps = Math.max(1, Math.min(50, steps + delta));
  }
  if (Math.random() < temperature) {
    out.guidance_scale = Math.max(0, Math.min(20, cfg + cfg * 0.3 * (Math.random() - 0.5)));
  }
  return out;
}

let dreamModeTimer = null;
function setDreamMode(on) {
  if (dreamModeTimer) { clearInterval(dreamModeTimer); dreamModeTimer = null; }
  if (!on) return;
  if (!$("prompt").value.trim()) { $("p-dream").checked = false; return; }
  dreamModeTimer = setInterval(() => {
    if (generating) return; // skip a beat rather than queueing up
    // read the prompt each beat: editing it re-targets the dream
    // (the reference's guideDream, useImageGeneration.js:404-414)
    const basePrompt = $("prompt").value.trim();
    if (!basePrompt) return;
    const temp = Math.max(0, Math.min(1, +$("p-dream-temp").value || 0.3));
    generate({
      prompt: dreamVariation(basePrompt, temp),
      ...mutateParams(temp),
      _label: "dream",
    });
  }, 4000);
}

// ---------------------------------------------------------------------------
// chat generation
// ---------------------------------------------------------------------------

// blob-URL lifecycle (reference api.js blob manager): long sessions used to
// leak one object URL per image forever; now the chat keeps a bounded
// window and revokes the URLs inside evicted messages.
const MAX_MESSAGES = 80;
function revokeBlobUrls(node) {
  for (const tagged of node.querySelectorAll("[data-blob-url]")) {
    URL.revokeObjectURL(tagged.dataset.blobUrl);
  }
}
function pruneMessages() {
  const box = $("messages");
  while (box.children.length > MAX_MESSAGES) {
    const evicted = box.firstElementChild;
    const h = evicted.offsetHeight;
    revokeBlobUrls(evicted);
    evicted.remove();
    // preserve the reading position when history shrinks above the
    // viewport (useScrollManagement's position-preservation contract)
    if (!SCROLL.stuck) box.scrollTop = Math.max(0, box.scrollTop - h);
  }
}

// ---------------------------------------------------------------------------
// chat scroll ergonomics — behavior rebuild of the reference's
// useScrollManagement.js:19-121 (sticky bottom: auto-follow only while at
// the bottom, re-stick when the user returns within 20px of it) and
// useSnapScroll.js:13-285 (low-velocity snap of the nearest image to the
// viewport center, ArrowUp/Down image navigation, snap-to-new near bottom)
// against the vanilla #messages container — no React, same feel.
// ---------------------------------------------------------------------------
const SCROLL = { stuck: true, lastTop: 0, lastT: 0, velocity: 0, snapTimer: null };
const BOTTOM_EPS = 20;          // within 20px counts as "at bottom"
const SNAP_THRESHOLD = 0.3;     // of viewport height from center
const VELOCITY_THRESHOLD = 50;  // px/s: slower than this when stopping → snap
const SNAP_IDLE_MS = 150;

function msgBox() { return $("messages"); }
function chatAtBottom(el) {
  return el.scrollHeight - el.scrollTop - el.clientHeight < BOTTOM_EPS;
}
function scrollToBottom(smooth = true) {
  const el = msgBox();
  el.scrollTo({ top: el.scrollHeight, behavior: smooth ? "smooth" : "auto" });
  SCROLL.stuck = true;
  updateJumpButton();
}
function chatImages() { return [...msgBox().querySelectorAll(".imgcard img")]; }
function distanceFromCenter(el) {
  const c = msgBox().getBoundingClientRect();
  const r = el.getBoundingClientRect();
  return (r.top + r.height / 2) - (c.top + c.height / 2);
}
function snapToImage(el, force = false) {
  if (!el) return;
  msgBox().scrollBy({
    top: distanceFromCenter(el), behavior: force ? "auto" : "smooth",
  });
}
function closestImage() {
  let best = null;
  chatImages().forEach((img, index) => {
    const dist = Math.abs(distanceFromCenter(img));
    if (!best || dist < best.dist) best = { el: img, dist, index };
  });
  return best;
}
function snapStep(dir) {
  const imgs = chatImages();
  if (!imgs.length) return;
  const cur = closestImage();
  const next = Math.max(0, Math.min(imgs.length - 1, (cur ? cur.index : 0) + dir));
  SCROLL.stuck = false;
  snapToImage(imgs[next]);
  updateJumpButton();
}
function updateJumpButton() {
  const btn = $("jump-latest");
  if (btn) btn.hidden = SCROLL.stuck;
}
function initChatScroll() {
  const el = msgBox();
  el.addEventListener("scroll", () => {
    const now = performance.now();
    const dt = now - SCROLL.lastT;
    if (dt > 0) SCROLL.velocity = (el.scrollTop - SCROLL.lastTop) / dt * 1000;
    SCROLL.lastTop = el.scrollTop;
    SCROLL.lastT = now;
    SCROLL.stuck = chatAtBottom(el);
    updateJumpButton();
    clearTimeout(SCROLL.snapTimer);
    SCROLL.snapTimer = setTimeout(() => {
      if (SCROLL.stuck || Math.abs(SCROLL.velocity) >= VELOCITY_THRESHOLD) return;
      const c = closestImage();
      if (c && c.dist < el.clientHeight * SNAP_THRESHOLD) snapToImage(c.el);
    }, SNAP_IDLE_MS);
  }, { passive: true });
  window.addEventListener("keydown", (e) => {
    const t = e.target.tagName;
    if (t === "INPUT" || t === "TEXTAREA" || t === "SELECT") return;
    if (e.key === "ArrowDown") { e.preventDefault(); snapStep(1); }
    else if (e.key === "ArrowUp") { e.preventDefault(); snapStep(-1); }
  });
  const btn = $("jump-latest");
  if (btn) btn.onclick = () => scrollToBottom(true);
  updateJumpButton();
}

function addMessage(kind, content) {
  const box = el("div", "msg " + kind);
  if (typeof content === "string") box.append(el("div", "text", content));
  else box.append(content);
  $("messages").append(box);
  pruneMessages();
  // sticky bottom: follow new content only while stuck; a user reading
  // history keeps their place and the "latest" pill lights up instead
  if (SCROLL.stuck) scrollToBottom();
  else updateJumpButton();
  return box;
}

function imageCard(blobUrl, meta) {
  const card = el("figure", "imgcard");
  const img = el("img");
  img.src = blobUrl;
  img.dataset.blobUrl = blobUrl; // revoked when the message is evicted
  img.alt = meta.prompt || "generated image";
  card.append(img);
  const cap = el("figcaption", "",
    `seed ${meta.seed ?? "?"} · ${meta.size || ""}` +
    (meta.key ? " · stored" : ""));
  card.append(cap);
  const row = el("div", "cardrow");
  const again = el("button", "mini", "↻ variation");
  again.onclick = () => {
    $("p-seed").value = "";
    $("prompt").value = meta.prompt || $("prompt").value;
    generate();
  };
  const reuse = el("button", "mini", "use seed");
  reuse.onclick = () => { $("p-seed").value = meta.seed; };
  const dl = el("a", "mini", "save");
  dl.href = blobUrl;
  dl.download = `dreamlab-${meta.seed ?? "img"}.png`;
  const copy = el("button", "mini", "copy prompt");
  copy.onclick = () => {
    if (navigator.clipboard) navigator.clipboard.writeText(meta.prompt || "");
  };
  row.append(again, reuse, dl, copy);
  card.append(row);
  return card;
}

// SSE generation: per-step progress events + base64 result (POST, so
// EventSource doesn't apply — parse the stream by hand)
async function generateViaStream(body, onStep, signal) {
  const resp = await api("/generate/stream", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify(body),
    signal,
  });
  if (!resp.ok || !resp.body) throw new Error(`${resp.status}`);
  const reader = resp.body.getReader();
  const dec = new TextDecoder();
  let buf = "";
  let result = null;
  for (;;) {
    const { done, value } = await reader.read();
    if (done) break;
    buf += dec.decode(value, { stream: true });
    let idx;
    while ((idx = buf.indexOf("\n\n")) >= 0) {
      const block = buf.slice(0, idx);
      buf = buf.slice(idx + 2);
      let ev = null, data = null;
      for (const line of block.split("\n")) {
        if (line.startsWith("event: ")) ev = line.slice(7);
        else if (line.startsWith("data: ")) data = JSON.parse(line.slice(6));
      }
      if (ev === "progress" && onStep) onStep(data);
      else if (ev === "result") result = data;
      else if (ev === "error") throw new Error(`${data.status}: ${data.detail}`);
    }
  }
  if (!result) throw new Error("stream ended without result");
  const bytes = Uint8Array.from(atob(result.image_b64), (c) => c.charCodeAt(0));
  return {
    blob: new Blob([bytes], { type: result.media_type || "image/png" }),
    seed: result.seed,
    image_key: result.image_key,
  };
}

let generating = false;
let genAbort = null; // controller of the in-flight generate, if any
let genToken = 0;
async function generate(overrides) {
  const isDream = overrides && overrides._label === "dream";
  if (generating && isDream) return; // dream beats skip rather than pile up
  const prompt = (overrides && overrides.prompt) || $("prompt").value.trim();
  if (!prompt) return;
  if (generating && genAbort) {
    // a user-initiated request supersedes the in-flight one: aborting the
    // fetch closes the connection, and the server cancels the queued job
    genAbort.abort();
  }
  const myToken = ++genToken;
  const ctrl = makeController();
  genAbort = ctrl;
  generating = true;
  $("send").disabled = true;
  const label = overrides && overrides._label;
  addMessage("user", label ? `[${label}] ${prompt}` : prompt);
  const pending = addMessage("bot pending", "dreaming…");
  const body = {
    prompt,
    size: $("p-size").value,
    num_inference_steps: +$("p-steps").value,
    guidance_scale: +$("p-cfg").value,
    superres: $("p-sr").checked,
    superres_magnitude: +$("p-sr-mag").value,
  };
  const seed = $("p-seed").value;
  if (seed !== "") body.seed = +seed;
  const neg = $("neg-prompt").value.trim();
  if (neg) body.negative_prompt = neg;
  const style = $("p-style").value;
  if (style) body.style_lora = { style, level: +$("p-style-level").value || 1 };
  const mode = $("mode-select").value;
  if (mode) body.mode = mode;
  if (overrides) {
    for (const k of ["num_inference_steps", "guidance_scale", "seed"]) {
      if (overrides[k] !== undefined) body[k] = overrides[k];
    }
  }
  try {
    const t0 = performance.now();
    // deterministic (seeded) requests hit the IndexedDB cache first
    const ckey = body.seed !== undefined ? cacheKey(body) : null;
    if (ckey) {
      const hit = await cacheGet(ckey);
      if (hit) {
        const meta = { ...hit.meta, ms: Math.round(performance.now() - t0) };
        pending.replaceChildren(imageCard(URL.createObjectURL(hit.blob), meta));
        pending.className = "msg bot";
        pending.append(el("div", "timing", `${meta.ms} ms (cached)`));
        return hit.blob;
      }
    }
    let blob, seedOut, keyOut;
    try {
      // live per-step progress over SSE (falls back to /generate below)
      const r = await generateViaStream(body, (p) => {
        pending.textContent = `dreaming… step ${p.step + 1}/${p.total_steps}`;
      }, ctrl.signal);
      blob = r.blob; seedOut = String(r.seed); keyOut = r.image_key;
    } catch (streamErr) {
      if (ctrl.signal.aborted) throw streamErr; // superseded — don't retry
      const resp = await api("/generate", {
        method: "POST",
        headers: { "Content-Type": "application/json" },
        body: JSON.stringify(body),
        signal: ctrl.signal,
      });
      if (!resp.ok) {
        const err = await resp.text();
        throw new Error(`${resp.status}: ${err.slice(0, 200)}`);
      }
      blob = await resp.blob();
      seedOut = resp.headers.get("X-Seed");
      keyOut = resp.headers.get("X-LCM-Image-Key");
    }
    const meta = {
      prompt,
      seed: seedOut,
      size: body.size,
      key: keyOut,
      ms: Math.round(performance.now() - t0),
    };
    pending.replaceChildren(imageCard(URL.createObjectURL(blob), meta));
    pending.className = "msg bot";
    pending.append(el("div", "timing", `${meta.ms} ms`));
    if (meta.key) rememberKey(meta);
    if (ckey) cachePut(ckey, blob, meta);
    return blob;
  } catch (e) {
    const msg = ctrl.signal.aborted ? "superseded" : "✗ " + e.message;
    pending.replaceChildren(el("div", "text error", msg));
    pending.className = "msg bot";
    return null;
  } finally {
    releaseController(ctrl);
    // only the latest request owns the shared UI state — a superseded
    // run's unwind must not re-enable the send button mid-generation
    if (genToken === myToken) {
      generating = false;
      genAbort = null;
      $("send").disabled = false;
    }
  }
}

// server-key recovery across reloads (reference App.jsx:74-99)
function rememberKey(meta) {
  const keys = JSON.parse(localStorage.getItem("imageKeys") || "[]");
  keys.push({ key: meta.key, prompt: meta.prompt, seed: meta.seed, size: meta.size });
  localStorage.setItem("imageKeys", JSON.stringify(keys.slice(-20)));
}
async function restoreImages() {
  const keys = JSON.parse(localStorage.getItem("imageKeys") || "[]");
  for (const meta of keys.slice(-6)) {
    try {
      const resp = await api("/storage/" + meta.key);
      if (!resp.ok) continue;
      const blob = await resp.blob();
      // rebuild the conversation shape: prompt bubble, then its image
      if (meta.prompt) addMessage("user restored", meta.prompt);
      addMessage("bot", imageCard(URL.createObjectURL(blob), meta));
    } catch (e) { /* expired keys are fine */ }
  }
}

// ---------------------------------------------------------------------------
// superres upload
// ---------------------------------------------------------------------------

let srAbort = null; // a new SR upload supersedes the previous one
async function upscaleFile(file) {
  setStatus("upscaling…");
  const form = new FormData();
  form.append("file", file, file.name);
  form.append("magnitude", $("p-sr-mag").value);
  form.append("out_format", "png");
  if (srAbort) srAbort.abort();
  const ctrl = makeController();
  srAbort = ctrl;
  try {
    const resp = await api("/superres", {
      method: "POST", body: form, signal: ctrl.signal,
    });
    if (!resp.ok) throw new Error("HTTP " + resp.status);
    const blob = await resp.blob();
    addMessage("bot", imageCard(URL.createObjectURL(blob), {
      prompt: "superres: " + file.name,
      seed: "-", size: resp.headers.get("X-SR-Passes") + " passes",
    }));
    setStatus("");
  } catch (e) {
    if (!ctrl.signal.aborted) setStatus("superres failed: " + e.message, true);
  } finally {
    releaseController(ctrl);
    if (srAbort === ctrl) srAbort = null;
  }
}

// ---------------------------------------------------------------------------
// modes + styles + health
// ---------------------------------------------------------------------------

async function loadStyles() {
  try {
    const resp = await api("/api/styles");
    if (!resp.ok) return;
    const data = await resp.json();
    const sel = $("p-style");
    for (const st of data.styles || []) {
      const o = el("option", "", st.name);
      o.value = st.name;
      sel.append(o);
    }
  } catch (e) { /* styles are optional */ }
}

async function loadModes() {
  try {
    const resp = await api("/api/modes");
    if (!resp.ok) return;
    const data = await resp.json();
    const sel = $("mode-select");
    sel.replaceChildren(el("option", "", ""));
    Object.keys(data.modes || {}).forEach((name) => {
      const o = el("option", "", name);
      o.value = name;
      if (name === data.current_mode) o.selected = true;
      sel.append(o);
    });
  } catch (e) { /* legacy backend: no modes */ }
}

async function pollHealth() {
  try {
    const resp = await api("/health");
    $("health-dot").classList.toggle("ok", resp.ok);
  } catch (e) {
    $("health-dot").classList.remove("ok");
  }
}

// ---------------------------------------------------------------------------
// dreams tab
// ---------------------------------------------------------------------------

let dreamTimer = null;
async function refreshDreams() {
  try {
    const st = await (await api("/dreams/status")).json();
    $("dream-status").textContent = st.running
      ? `dreaming… ${st.stats.generated} candidates, ` +
        `${st.stats.dreams_per_sec.toFixed(1)}/s, ${st.stats.rendered} rendered`
      : "idle";
    const top = await (await api("/dreams/top?n=12")).json();
    const box = $("dream-top");
    box.replaceChildren();
    for (const c of top.top || []) {
      const card = el("div", "dreamcard");
      if (c.rendered) {
        const img = el("img");
        img.src = apiBase() + "/dreams/image/" + c.id;
        card.append(img);
      } else {
        card.append(el("div", "placeholder", "…"));
      }
      card.append(el("div", "score", c.score.toFixed(3) + " · seed " + c.seed));
      card.onclick = () => {
        $("p-seed").value = c.seed;
        $("prompt").value = c.prompt;
        switchTab("chat");
      };
      box.append(card);
    }
  } catch (e) {
    $("dream-status").textContent = "dreams unavailable";
  }
}

async function startDream() {
  const prompt = $("dream-prompt").value.trim();
  if (!prompt) return;
  await api("/dreams/start", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({ prompt, strategy: $("dream-strategy").value }),
  });
  refreshDreams();
}
async function stopDream() {
  await api("/dreams/stop", { method: "POST" });
  refreshDreams();
}

// ---------------------------------------------------------------------------
// Comfy job panel (reference useComfyJob.js:16-18): 750 ms poll with 30 s
// stale and 6 min hard timeouts, progress bar from progress.fraction.
// ---------------------------------------------------------------------------

const COMFY_POLL_MS = 750;
let comfyBase = "";  // pinned to the backend that accepted the job — the
                     // job store is per-process, round-robin would 404
const COMFY_STALE_MS = 30 * 1000;
const COMFY_HARD_MS = 6 * 60 * 1000;
let comfyPoll = null;
let comfyStartedAt = 0;
let comfyLastChangeAt = 0;
let comfyLastFingerprint = "";

function comfySetState(text, fraction) {
  $("comfy-state").textContent = text;
  if (fraction !== undefined) {
    $("comfy-bar").style.width = Math.round(fraction * 100) + "%";
  }
}

function comfyStopPolling() {
  if (comfyPoll) { clearInterval(comfyPoll); comfyPoll = null; }
  $("comfy-cancel").disabled = true;
}

async function comfyStart() {
  const workflowId = $("comfy-workflow").value.trim();
  if (!workflowId) return comfySetState("workflow id required", 0);
  comfyStopPolling();
  $("comfy-outputs").replaceChildren();
  const form = new FormData();
  form.append("workflowId", workflowId);
  form.append("params", $("comfy-params").value.trim() || "{}");
  const profile = $("comfy-profile").value;
  if (profile) form.append("profile", profile);
  const file = $("comfy-image").files[0];
  if (file) form.append("image", file, file.name);
  comfySetState("starting…", 0);
  let data;
  try {
    comfyBase = apiBase();
    const resp = await fetch(comfyBase + "/v1/comfy/jobs", { method: "POST", body: form });
    data = await resp.json();
    if (!resp.ok) throw new Error(data.detail || "HTTP " + resp.status);
  } catch (e) {
    return comfySetState("✗ " + e.message, 0);
  }
  const jobId = data.jobId;
  comfyStartedAt = comfyLastChangeAt = Date.now();
  comfyLastFingerprint = "";
  $("comfy-cancel").disabled = false;
  comfyPoll = setInterval(() => comfyPollOnce(jobId), COMFY_POLL_MS);
}

async function comfyPollOnce(jobId) {
  const now = Date.now();
  if (now - comfyStartedAt > COMFY_HARD_MS) {
    comfyStopPolling();
    return comfySetState("✗ hard timeout (6 min)");
  }
  let job;
  try {
    const resp = await fetch(comfyBase + "/v1/comfy/jobs/" + jobId);
    if (!resp.ok) return; // transient (restart / proxy hiccup): stale timer decides
    job = await resp.json();
  } catch (e) {
    return; // transient poll failure
  }
  const fp = JSON.stringify([job.status, job.progress]);
  if (fp !== comfyLastFingerprint) {
    comfyLastFingerprint = fp;
    comfyLastChangeAt = now;
  } else if (now - comfyLastChangeAt > COMFY_STALE_MS) {
    comfyStopPolling();
    return comfySetState("✗ stale (no progress 30 s)");
  }
  const frac = (job.progress && job.progress.fraction) || 0;
  comfySetState(
    `${job.status}` +
    (job.progress && job.progress.node ? ` · node ${job.progress.node}` : ""),
    frac);
  if (job.status === "done") {
    comfyStopPolling();
    comfySetState("done", 1);
    const box = $("comfy-outputs");
    for (const ref of job.outputs || []) {
      const q = new URLSearchParams(ref).toString();
      const img = el("img", "comfyout");
      img.src = comfyBase + "/v1/comfy/view?" + q;
      img.alt = ref.filename;
      box.append(img);
      box.append(el("div", "score", ref.filename));
    }
  } else if (job.status === "error") {
    comfyStopPolling();
    comfySetState("✗ " + (job.error || "job failed"), frac);
  }
}

function comfyCancel() {
  comfyStopPolling();
  comfySetState("canceled");
}

async function loadComfyProfiles() {
  // profile names are static in the reference; mirror its registry
  for (const name of ["subtle-refine", "strong-restyle", "upscale-detail"]) {
    const o = el("option", "", name);
    o.value = name;
    $("comfy-profile").append(o);
  }
}

// ---------------------------------------------------------------------------
// wiring
// ---------------------------------------------------------------------------

function switchTab(name) {
  $("view-chat").hidden = name !== "chat";
  $("view-dreams").hidden = name !== "dreams";
  $("view-comfy").hidden = name !== "comfy";
  $("tab-chat").classList.toggle("active", name === "chat");
  $("tab-dreams").classList.toggle("active", name === "dreams");
  $("tab-comfy").classList.toggle("active", name === "comfy");
  if (name === "dreams") {
    refreshDreams();
    if (!dreamTimer) dreamTimer = setInterval(refreshDreams, 3000);
  } else if (dreamTimer) {
    clearInterval(dreamTimer);
    dreamTimer = null;
  }
}

window.addEventListener("DOMContentLoaded", () => {
  $("send").onclick = () => generate();

  // latent exploration presets
  const presetSel = $("p-preset");
  for (const [id, p] of Object.entries(LATENT_PRESETS)) {
    const o = el("option", "", p.name);
    o.value = id;
    presetSel.append(o);
  }
  $("explore").onclick = () => {
    if (presetSel.value) runPreset(presetSel.value);
  };

  // client-side dream mode
  $("p-dream").addEventListener("change", (e) => setDreamMode(e.target.checked));
  $("prompt").addEventListener("keydown", (e) => {
    if (e.key === "Enter" && !e.shiftKey) { e.preventDefault(); generate(); }
  });
  $("tab-chat").onclick = () => switchTab("chat");
  $("tab-dreams").onclick = () => switchTab("dreams");
  $("tab-comfy").onclick = () => switchTab("comfy");
  $("comfy-start").onclick = comfyStart;
  $("comfy-cancel").onclick = comfyCancel;
  loadComfyProfiles();
  $("dream-start").onclick = startDream;
  $("dream-stop").onclick = stopDream;
  $("sr-file").addEventListener("change", (e) => {
    if (e.target.files[0]) upscaleFile(e.target.files[0]);
  });
  $("mode-select").addEventListener("change", async (e) => {
    if (!e.target.value) return;
    setStatus("switching mode…");
    await api("/api/modes/switch", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ mode: e.target.value, wait_seconds: 60 }),
    });
    setStatus("");
  });

  // drag-drop PNG parameter restore (reference useDropIngest.js)
  const prompt = $("prompt");
  prompt.addEventListener("dragover", (e) => e.preventDefault());
  prompt.addEventListener("drop", async (e) => {
    e.preventDefault();
    const file = e.dataTransfer.files[0];
    if (!file) return;
    const buf = await file.arrayBuffer();
    const text = parsePngText(buf);
    if (text.parameters) {
      applyA1111Params(text.parameters);
      setStatus("parameters restored from PNG");
    } else {
      setStatus("no generation metadata in that PNG", true);
    }
  });

  initChatScroll();
  loadModes();
  loadStyles();
  pollHealth();
  setInterval(pollHealth, 10000);
  restoreImages();
});
