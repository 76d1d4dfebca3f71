// Core plumbing: JSON-RPC helper, SSE callback bus, navigation, log panel,
// global encode overlay, project startup page.
"use strict";

// ---- RPC -------------------------------------------------------------
async function rpc(method, ...args) {
  const resp = await fetch("/api/" + method, {
    method: "POST",
    body: JSON.stringify({ args }),
  });
  const j = await resp.json();
  if (j.error) throw new Error(j.error);
  return j.result;
}
async function rpcKw(method, args, kwargs) {
  const resp = await fetch("/api/" + method, {
    method: "POST",
    body: JSON.stringify({ args, kwargs }),
  });
  const j = await resp.json();
  if (j.error) throw new Error(j.error);
  return j.result;
}

// ---- HTML escaping ----------------------------------------------------
// Project-controlled strings (camera names, RTSP URLs, dataset/behavior
// names, file paths — anything that can arrive via an imported/shared
// project YAML) must pass through esc() before innerHTML interpolation:
// inside the Electron shell an injected <img onerror=...> would run with
// access to the preload bridge.
function esc(s) {
  return String(s).replace(/[&<>"']/g, (c) => (
    { "&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;", "'": "&#39;" }[c]
  ));
}

// ---- SSE callback bus -------------------------------------------------
// Worker callbacks (cbas_tpu/app/workers.py docstring) arrive as
// {name, args}; pages register handlers by callback name.
const bus = {
  handlers: {},
  on(name, fn) { (this.handlers[name] = this.handlers[name] || []).push(fn); },
  emit(name, args) { (this.handlers[name] || []).forEach((f) => f(...args)); },
};
const es = new EventSource("/events");
es.onmessage = (e) => {
  const d = JSON.parse(e.data);
  bus.emit(d.name, d.args || []);
};

// ---- metrics panel -----------------------------------------------------
// Observability: per-stage throughput counters (Api.get_metrics — decode
// fps, encode fps, inference windows/s, train steps/s) on demand.
document.getElementById("metrics-btn").onclick = async () => {
  const panel = document.getElementById("metrics-panel");
  if (!panel.classList.toggle("hidden")) {
    const m = await rpc("get_metrics");
    panel.textContent = Object.keys(m || {}).length
      ? Object.entries(m).map(([k, v]) => `${k}: ${JSON.stringify(v)}`).join("\n")
      : "no samples yet — run an encode / inference / training first";
  }
};

// ---- log panel ---------------------------------------------------------
const logPanel = document.getElementById("log-panel");
// Persist across reloads within the tab, like the reference log panel
// (reference: frontend/js/global.js sessionStorage persistence).
try { logPanel.textContent = sessionStorage.getItem("cbas_log") || ""; } catch (_) {}
bus.on("log_line", (line) => {
  const lines = (line + "\n" + logPanel.textContent).split("\n").slice(0, 300);
  logPanel.textContent = lines.join("\n");
  try { sessionStorage.setItem("cbas_log", logPanel.textContent); } catch (_) {}
});

// ---- global encode overlay ----------------------------------------------
const overlay = document.getElementById("encode-overlay");
const overlayFill = document.getElementById("encode-bar-fill");
const overlayText = document.getElementById("encode-overlay-text");
// While the overlay is visible, poll the queue depth so newly-watched files
// arriving mid-batch are reflected (reference: global.js:170 polls
// get_encoding_queue_status to drive the overlay counts).
let encodeQueuePoll = null;
let encodeQueueLine = "";
function stopEncodeQueuePoll() {
  clearInterval(encodeQueuePoll);
  encodeQueuePoll = null;
  encodeQueueLine = "";
}
bus.on("update_global_encoding_progress", (done, total, pct) => {
  if (done >= total) {
    overlay.classList.add("hidden");
    stopEncodeQueuePoll();
    return;
  }
  overlay.classList.remove("hidden");
  overlayFill.style.width = pct + "%";
  overlayText.textContent =
    `encoding ${done + 1}/${total} (${pct.toFixed(0)}%)` + encodeQueueLine;
  if (!encodeQueuePoll)
    encodeQueuePoll = setInterval(async () => {
      try {
        const s = await rpc("get_encoding_queue_status");
        encodeQueueLine = s.queued > 0 ? ` · ${s.queued} queued` : "";
      } catch (_) {
        stopEncodeQueuePoll();
      }
    }, 3000);
});

// ---- modal helper ---------------------------------------------------------
// One shared overlay for the dataset tool dialogs (manage / whitelist /
// review playlists / disagreements), mirroring the reference's bootstrap
// modals (label_train_page.js show*Modal family) without the framework.
function showModal(title) {
  const ov = document.getElementById("modal-overlay");
  document.getElementById("modal-title").textContent = title;
  const body = document.getElementById("modal-body");
  body.innerHTML = "";
  ov.classList.remove("hidden");
  return body;
}
function closeModal() {
  document.getElementById("modal-overlay").classList.add("hidden");
}
document.addEventListener("DOMContentLoaded", () => {
  document.getElementById("modal-close").onclick = closeModal;
  document.getElementById("modal-overlay").onclick = (e) => {
    if (e.target.id === "modal-overlay") closeModal();
  };
});

// ---- navigation ----------------------------------------------------------
const pages = ["startup", "record", "label", "infer", "visualize"];
function showPage(name) {
  pages.forEach((p) => {
    document.getElementById("page-" + p).classList.toggle("hidden", p !== name);
  });
  document.querySelectorAll("#nav button[data-page]").forEach((b) => {
    b.classList.toggle("active", b.dataset.page === name);
  });
  document.dispatchEvent(new CustomEvent("page:" + name));
}
document.querySelectorAll("#nav button[data-page]").forEach((b) => {
  b.onclick = () => showPage(b.dataset.page);
});

// ---- startup page ---------------------------------------------------------
const $ = (id) => document.getElementById(id);

async function refreshStatus() {
  try {
    const s = await rpc("get_cbas_status");
    $("su-status").textContent = JSON.stringify(s, null, 1);
    const root = await rpc("get_project_root");
    $("nav-status").textContent = root
      ? `${root} · encoder ${s.encoder_ready ? "ready" : "…"}`
      : "no project";
    return s;
  } catch (e) {
    $("su-status").textContent = String(e);
  }
}

function recentProjects() {
  try { return JSON.parse(localStorage.getItem("cbas_recent") || "[]"); }
  catch (_) { return []; }
}
function rememberProject(path) {
  const rec = [path, ...recentProjects().filter((p) => p !== path)].slice(0, 6);
  localStorage.setItem("cbas_recent", JSON.stringify(rec));
  renderRecent();
}
function renderRecent() {
  const div = $("su-recent");
  div.innerHTML = "";
  recentProjects().forEach((p) => {
    const b = document.createElement("button");
    b.textContent = p;
    b.onclick = () => { $("su-path").value = p; openProject(p); };
    div.appendChild(b);
  });
}

async function openProject(path) {
  $("su-status").textContent = "loading (encoder weights + stale sweep)…";
  try {
    const r = await rpc("load_project", path);
    if (!r.success) throw new Error(r.message || "load failed");
    rememberProject(path);
    await refreshStatus();
    document.dispatchEvent(new CustomEvent("project:loaded"));
  } catch (e) {
    $("su-status").textContent = String(e);
  }
}

$("su-open").onclick = () => openProject($("su-path").value.trim());
$("su-create").onclick = async () => {
  try {
    const r = await rpc("create_project", $("su-parent").value.trim(), $("su-name").value.trim());
    if (r.success && r.path) openProject(r.path);
    else $("su-status").textContent = JSON.stringify(r);
  } catch (e) {
    $("su-status").textContent = String(e);
  }
};

// ---- Electron shell integration -------------------------------------------
// Under shell/main.js the preload exposes native dialogs; wire Browse buttons
// next to the path inputs. In a plain browser the inputs stay type-in-only.
function addBrowse(inputId, picker) {
  if (!window.electronAPI) return;
  const input = document.getElementById(inputId);
  const btn = document.createElement("button");
  btn.textContent = "Browse…";
  btn.onclick = async () => {
    const v = await picker();
    if (v) input.value = Array.isArray(v) ? v.join("\n") : v;
  };
  input.insertAdjacentElement("afterend", btn);
}
addBrowse("su-path", () => window.electronAPI.openDirectory());
addBrowse("su-parent", () => window.electronAPI.openDirectory());
addBrowse("rc-import-paths", () => window.electronAPI.openFiles());

renderRecent();
refreshStatus().then((s) => {
  if (s && s.project_loaded) document.dispatchEvent(new CustomEvent("project:loaded"));
});
setInterval(refreshStatus, 15000);
