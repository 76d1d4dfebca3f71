// Record page: camera cards, recording control, live preview, video import.
"use strict";
(() => {
  const $ = (id) => document.getElementById(id);
  let activeStreams = {}; // name -> epoch start time
  let previewingCamera = null; // preview button is a toggle
  let timerInterval = null;

  // Per-camera elapsed recording timers, 1 Hz (reference:
  // record_page.js updateRecordingTimers — HH:MM:SS, "Nd HHh" past 100 h).
  function formatElapsed(sec) {
    const h = Math.floor(sec / 3600);
    if (h >= 100) return `${Math.floor(h / 24)}d ${String(h % 24).padStart(2, "0")}h`;
    const m = Math.floor((sec % 3600) / 60);
    return `${String(h).padStart(2, "0")}:${String(m).padStart(2, "0")}:${String(Math.floor(sec % 60)).padStart(2, "0")}`;
  }

  function updateTimers() {
    const names = Object.keys(activeStreams);
    if (!names.length && timerInterval) {
      clearInterval(timerInterval);
      timerInterval = null;
      return;
    }
    const now = Date.now() / 1000;
    for (const name of names) {
      const el = document.querySelector(`[data-timer="${CSS.escape(name)}"]`);
      if (el) el.textContent = formatElapsed(Math.max(0, now - activeStreams[name]));
    }
  }

  async function refreshCameras() {
    const [cams, streams, sessions] = await Promise.all([
      rpc("get_camera_list"),
      rpc("get_active_streams"),
      rpc("get_existing_session_names"),
    ]);
    activeStreams = streams || {};
    if (Object.keys(activeStreams).length && !timerInterval)
      timerInterval = setInterval(updateTimers, 1000);
    $("rc-sessions").innerHTML = sessions
      .map((s) => `<option value="${esc(s)}">`)
      .join("");
    const cards = $("rc-cards");
    cards.innerHTML = "";
    cams.forEach((cam) => cards.appendChild(cameraCard(cam)));
  }

  function cameraCard(cam) {
    const card = document.createElement("div");
    card.className = "card";
    const recording = cam.name in activeStreams;
    const name = esc(cam.name);
    card.innerHTML = `
      <h3>${name} ${recording ? `<span class="rec">● REC <span data-timer="${name}"></span></span>` : ""}</h3>
      <img data-thumb="${name}" alt="">
      <div class="muted">${esc(cam.rtsp_url || "no URL")}</div>
      <div class="formrow">
        name <input size="10" value="${name}" data-rename>
        fps <input size="2" value="${esc(cam.framerate)}" data-f="framerate">
        res <input size="3" value="${esc(cam.resolution)}" data-f="resolution">
        seg(s) <input size="4" value="${esc(cam.segment_seconds)}" data-f="segment_seconds">
      </div>
      <div class="formrow">
        crop x <input size="3" value="${esc(cam.crop_left_x)}" data-f="crop_left_x">
        y <input size="3" value="${esc(cam.crop_top_y)}" data-f="crop_top_y">
        w <input size="3" value="${esc(cam.crop_width)}" data-f="crop_width">
        h <input size="3" value="${esc(cam.crop_height)}" data-f="crop_height">
      </div>
      <div class="formrow">
        <button data-act="save">Save</button>
        <button data-act="rec">${recording ? "Stop" : "Record"}</button>
        <button data-act="preview">Preview</button>
        <button data-act="crop">Edit crop</button>
        <button data-act="del" class="danger">Delete</button>
      </div>`;
    card.querySelector('[data-act="save"]').onclick = async () => {
      // A changed name field renames first (moves cameras/<old>/ on disk,
      // stopping any active stream — reference: record_page.js:396 +
      // record_page.py rename_camera_internal), then settings save under
      // the new name.
      let saveName = cam.name;
      const newName = card.querySelector("[data-rename]").value.trim();
      if (newName && newName !== cam.name) {
        if (!(await rpc("rename_camera", cam.name, newName))) {
          alert(`rename failed: '${newName}' may already exist`);
          refreshCameras();
          return;
        }
        saveName = newName;
      }
      const settings = { rtsp_url: cam.rtsp_url };
      card.querySelectorAll("[data-f]").forEach((inp) => {
        const v = parseFloat(inp.value);
        // empty/invalid input -> keep the camera's current value (NaN would
        // serialize to null and crash CameraSettings validation server-side)
        settings[inp.dataset.f] = Number.isFinite(v) ? v : cam[inp.dataset.f];
      });
      try {
        await rpc("save_camera_settings", saveName, settings);
      } catch (e) {
        alert("save failed: " + e.message);
      }
      refreshCameras();
    };
    card.querySelector('[data-act="rec"]').onclick = async () => {
      if (cam.name in activeStreams) {
        await rpc("stop_camera_stream", cam.name);
      } else {
        const session = $("rc-session").value.trim() || "session1";
        await rpc("start_camera_stream", cam.name, session);
      }
      refreshCameras();
    };
    card.querySelector('[data-act="preview"]').onclick = async () => {
      // toggle, like the reference's toggleLivePreview (record_page.js:233)
      if (previewingCamera === cam.name) {
        await rpc("stop_live_preview");
        previewingCamera = null;
        $("rc-preview").classList.add("hidden");
        $("rc-preview-label").textContent = "preview stopped";
        return;
      }
      previewingCamera = cam.name;
      $("rc-preview-label").textContent = `previewing ${cam.name} (30 s auto-stop)…`;
      await rpc("start_live_preview", cam.name);
    };
    card.querySelector("[data-thumb]").onclick = async () => {
      const b64 = await rpc("get_single_camera_thumbnail", cam.name);
      if (b64) card.querySelector("[data-thumb]").src = "data:image/jpeg;base64," + b64;
    };
    card.querySelector('[data-act="crop"]').onclick = () => openCropEditor(cam, card);
    card.querySelector('[data-act="del"]').onclick = async () => {
      if (confirm(`Delete camera ${cam.name}?`)) {
        await rpc("delete_camera", cam.name);
        refreshCameras();
      }
    };
    return card;
  }

  // ---------- interactive crop editor ----------
  // Canvas drag-cropping over a camera frame: draw a new box, drag inside to
  // move it, grab an edge/corner handle to resize. Saves as the fractional
  // crop settings the recorder consumes (reference: record_page.js crop
  // overlay — mousedown/move/up with 8 resize handles).
  const crop = { cam: null, card: null, img: null, rect: null, drag: null };
  const HANDLE = 8;

  function cropHandleAt(x, y) {
    if (!crop.rect) return null;
    const { x: rx, y: ry, w, h } = crop.rect;
    const near = (a, b) => Math.abs(a - b) <= HANDLE;
    const inX = x > rx - HANDLE && x < rx + w + HANDLE;
    const inY = y > ry - HANDLE && y < ry + h + HANDLE;
    let hdl = "";
    if (near(y, ry) && inX) hdl += "n";
    if (near(y, ry + h) && inX) hdl += "s";
    if (near(x, rx) && inY) hdl += "w";
    if (near(x, rx + w) && inY) hdl += "e";
    if (hdl) return hdl;
    if (x > rx && x < rx + w && y > ry && y < ry + h) return "move";
    return null;
  }

  function drawCropOverlay() {
    const cv = $("rc-crop-canvas");
    const ctx = cv.getContext("2d");
    ctx.clearRect(0, 0, cv.width, cv.height);
    if (crop.img) ctx.drawImage(crop.img, 0, 0, cv.width, cv.height);
    ctx.fillStyle = "rgba(0,0,0,0.55)";
    ctx.fillRect(0, 0, cv.width, cv.height);
    if (crop.rect && crop.rect.w > 0 && crop.rect.h > 0) {
      const { x, y, w, h } = crop.rect;
      if (crop.img) ctx.drawImage(
        crop.img,
        (x / cv.width) * crop.img.width, (y / cv.height) * crop.img.height,
        (w / cv.width) * crop.img.width, (h / cv.height) * crop.img.height,
        x, y, w, h);
      ctx.strokeStyle = "#fff";
      ctx.lineWidth = 2;
      ctx.strokeRect(x, y, w, h);
      ctx.fillStyle = "#fff";
      for (const fx of [0, 0.5, 1]) for (const fy of [0, 0.5, 1]) {
        if (fx === 0.5 && fy === 0.5) continue;
        ctx.fillRect(x + fx * w - 3, y + fy * h - 3, 6, 6);
      }
    }
    const f = cropFractions();
    $("rc-crop-values").textContent =
      `x ${f.crop_left_x.toFixed(3)} · y ${f.crop_top_y.toFixed(3)} · ` +
      `w ${f.crop_width.toFixed(3)} · h ${f.crop_height.toFixed(3)}`;
  }

  function cropFractions() {
    const cv = $("rc-crop-canvas");
    const r = crop.rect;
    if (!r || r.w <= 0 || r.h <= 0)
      return { crop_left_x: 0, crop_top_y: 0, crop_width: 1, crop_height: 1 };
    return {
      crop_left_x: Math.max(0, r.x / cv.width),
      crop_top_y: Math.max(0, r.y / cv.height),
      crop_width: Math.min(1, r.w / cv.width),
      crop_height: Math.min(1, r.h / cv.height),
    };
  }

  // Same editor, import mode: Apply writes the fractions into the
  // crop-on-import fields instead of camera settings (reference:
  // setupCropOnImportModal / initializeImportCropper,
  // label_train_page.js:765-860 drag a box over the video's first frame).
  async function openImportCropEditor() {
    const first = $("rc-import-paths").value.split("\n").map((s) => s.trim()).filter(Boolean)[0];
    if (!first) {
      $("rc-import-progress").textContent = "enter a video path first";
      return;
    }
    crop.cam = null;
    crop.card = null;
    crop.mode = "import";
    $("rc-crop-cam").textContent = "import: " + first.split("/").pop();
    $("rc-crop-editor").classList.remove("hidden");
    const cv = $("rc-crop-canvas");
    const f = (id, dflt) => {
      const v = parseFloat($(id).value);
      return Number.isFinite(v) ? v : dflt;
    };
    crop.rect = {
      x: f("rc-imp-crop-x", 0) * cv.width,
      y: f("rc-imp-crop-y", 0) * cv.height,
      w: f("rc-imp-crop-w", 1) * cv.width,
      h: f("rc-imp-crop-h", 1) * cv.height,
    };
    crop.img = null;
    drawCropOverlay();
    const b64 = await rpc("get_frame_from_video", first, 0);
    if (b64) {
      const img = new Image();
      img.onload = () => { crop.img = img; drawCropOverlay(); };
      img.src = "data:image/jpeg;base64," + b64;
    }
  }

  async function openCropEditor(cam, card) {
    crop.cam = cam;
    crop.card = card;
    crop.mode = "camera";
    $("rc-crop-cam").textContent = cam.name;
    $("rc-crop-editor").classList.remove("hidden");
    const cv = $("rc-crop-canvas");
    crop.rect = {
      x: (cam.crop_left_x || 0) * cv.width,
      y: (cam.crop_top_y || 0) * cv.height,
      w: (cam.crop_width !== undefined ? cam.crop_width : 1) * cv.width,
      h: (cam.crop_height !== undefined ? cam.crop_height : 1) * cv.height,
    };
    crop.img = null;
    drawCropOverlay();
    const thumb = card && card.querySelector("[data-thumb]");
    let src = thumb && thumb.src && thumb.src.startsWith("data:") ? thumb.src : null;
    if (!src) {
      const thumbs = await rpc("fetch_specific_thumbnails", [cam.name]);
      if (thumbs[cam.name]) src = "data:image/jpeg;base64," + thumbs[cam.name];
    }
    if (src) {
      const img = new Image();
      img.onload = () => { crop.img = img; drawCropOverlay(); };
      img.src = src;
    }
  }

  function cropPos(e) {
    const r = $("rc-crop-canvas").getBoundingClientRect();
    return [e.clientX - r.left, e.clientY - r.top];
  }

  $("rc-crop-canvas").addEventListener("mousedown", (e) => {
    const [x, y] = cropPos(e);
    const hdl = cropHandleAt(x, y);
    if (hdl === "move") {
      crop.drag = { mode: "move", dx: x - crop.rect.x, dy: y - crop.rect.y };
    } else if (hdl) {
      crop.drag = { mode: hdl };
    } else {
      crop.rect = { x, y, w: 0, h: 0 };
      crop.drag = { mode: "se" }; // drawing a fresh box = dragging its corner
    }
  });
  $("rc-crop-canvas").addEventListener("mousemove", (e) => {
    const cv = $("rc-crop-canvas");
    const [x, y] = cropPos(e);
    if (!crop.drag) {
      const hdl = cropHandleAt(x, y);
      cv.style.cursor = hdl === "move" ? "move"
        : hdl ? (/^(n|s)$/.test(hdl) ? "ns-resize" : /^(e|w)$/.test(hdl) ? "ew-resize"
                 : hdl === "ne" || hdl === "sw" ? "nesw-resize" : "nwse-resize")
        : "crosshair";
      return;
    }
    const r = crop.rect, m = crop.drag.mode;
    if (m === "move") {
      r.x = Math.min(Math.max(0, x - crop.drag.dx), cv.width - r.w);
      r.y = Math.min(Math.max(0, y - crop.drag.dy), cv.height - r.h);
    } else {
      if (m.includes("e")) r.w = Math.max(0, Math.min(cv.width, x) - r.x);
      if (m.includes("s")) r.h = Math.max(0, Math.min(cv.height, y) - r.y);
      if (m.includes("w")) { const x1 = r.x + r.w; r.x = Math.max(0, Math.min(x, x1)); r.w = x1 - r.x; }
      if (m.includes("n")) { const y1 = r.y + r.h; r.y = Math.max(0, Math.min(y, y1)); r.h = y1 - r.y; }
    }
    drawCropOverlay();
  });
  const endCropDrag = () => { crop.drag = null; };
  $("rc-crop-canvas").addEventListener("mouseup", endCropDrag);
  $("rc-crop-canvas").addEventListener("mouseleave", endCropDrag);

  $("rc-crop-apply").onclick = async () => {
    if (crop.mode === "import") {
      const fr = cropFractions();
      $("rc-imp-crop-x").value = fr.crop_left_x.toFixed(3);
      $("rc-imp-crop-y").value = fr.crop_top_y.toFixed(3);
      $("rc-imp-crop-w").value = fr.crop_width.toFixed(3);
      $("rc-imp-crop-h").value = fr.crop_height.toFixed(3);
      $("rc-imp-crop").checked =
        !(fr.crop_left_x === 0 && fr.crop_top_y === 0 && fr.crop_width === 1 && fr.crop_height === 1);
      $("rc-crop-editor").classList.add("hidden");
      return;
    }
    if (!crop.cam) return;
    const settings = Object.assign(
      { rtsp_url: crop.cam.rtsp_url, framerate: crop.cam.framerate,
        resolution: crop.cam.resolution, segment_seconds: crop.cam.segment_seconds },
      cropFractions());
    try {
      await rpc("save_camera_settings", crop.cam.name, settings);
    } catch (err) {
      alert("save failed: " + err.message);
    }
    $("rc-crop-editor").classList.add("hidden");
    refreshCameras();
  };
  $("rc-crop-reset").onclick = () => {
    const cv = $("rc-crop-canvas");
    crop.rect = { x: 0, y: 0, w: cv.width, h: cv.height };
    drawCropOverlay();
  };
  $("rc-crop-close").onclick = () => $("rc-crop-editor").classList.add("hidden");

  async function loadThumbnails() {
    const names = [...document.querySelectorAll("[data-thumb]")].map(
      (img) => img.dataset.thumb
    );
    if (!names.length) return;
    const thumbs = await rpc("fetch_specific_thumbnails", names);
    document.querySelectorAll("[data-thumb]").forEach((img) => {
      const b64 = thumbs[img.dataset.thumb];
      if (b64) img.src = "data:image/jpeg;base64," + b64;
    });
  }

  bus.on("update_live_frame", (name, b64) => {
    const img = $("rc-preview");
    img.src = "data:image/jpeg;base64," + b64;
    img.classList.remove("hidden");
    $("rc-preview-label").textContent = `live: ${name}`;
  });
  bus.on("end_live_preview", (name) => {
    // Only react to the CURRENT camera's stream ending: switching preview
    // A->B fires A's on_end asynchronously after B is already live, and
    // hiding the pane then would make B's preview look dead until its
    // first RTSP frame arrives.
    if (previewingCamera !== name) return;
    previewingCamera = null;
    $("rc-preview").classList.add("hidden");
    $("rc-preview-label").textContent = `preview ended (${name})`;
  });
  bus.on("update_import_progress", (pct, msg) => {
    $("rc-import-progress").textContent = `${pct.toFixed ? pct.toFixed(0) : pct}% ${msg || ""}`;
  });

  $("rc-refresh").onclick = refreshCameras;
  $("rc-thumbs").onclick = loadThumbnails;
  $("rc-add").onclick = async () => {
    const name = $("rc-new-name").value.trim();
    if (!name) return;
    await rpc("create_camera", name, { rtsp_url: $("rc-new-url").value.trim() });
    $("rc-new-name").value = "";
    refreshCameras();
  };
  $("rc-start-all").onclick = async () => {
    const session = $("rc-session").value.trim() || "session1";
    const cams = await rpc("get_camera_list");
    for (const cam of cams) await rpc("start_camera_stream", cam.name, session);
    refreshCameras();
  };
  $("rc-stop-all").onclick = async () => {
    await rpc("stop_all_camera_streams");
    refreshCameras();
  };
  // status summary (reference: showStatusModal -> get_cbas_status)
  $("rc-status").onclick = async () => {
    const s = await rpc("get_cbas_status");
    const recs = Object.keys(activeStreams);
    $("rc-status-line").textContent =
      (recs.length ? `recording: ${recs.join(", ")}` : "no cameras recording") +
      ` · encode queue: ${s.encode_done}/${s.encode_total}` +
      (s.live_model ? ` · live model: ${s.live_model}` : "");
  };
  $("rc-reveal").onclick = async () => {
    const path = await rpc("reveal_recording_folder");
    $("rc-status-line").textContent = path ? `recordings: ${path}` : "no project loaded";
  };
  // apply shared settings to every camera (reference: syncAllCameraSettings)
  $("rc-sync-all").onclick = async () => {
    const settings = {
      framerate: parseInt($("rc-sync-fps").value, 10) || 10,
      resolution: parseInt($("rc-sync-res").value, 10) || 256,
      segment_seconds: parseInt($("rc-sync-seg").value, 10) || 600,
    };
    if (!confirm(`Apply fps ${settings.framerate}, res ${settings.resolution}, ` +
        `segment ${settings.segment_seconds}s to ALL cameras?`)) return;
    await rpc("save_all_camera_settings", settings);
    refreshCameras();
  };
  $("rc-imp-crop-drag").onclick = openImportCropEditor;
  $("rc-import").onclick = async () => {
    const sources = $("rc-import-paths").value.split("\n").map((s) => s.trim()).filter(Boolean);
    if (!sources.length) return;
    const impSession = $("rc-imp-session").value.trim();
    const impSubject = $("rc-imp-subject").value.trim();
    if (!impSession || !impSubject) {
      $("rc-import-progress").textContent = "session and subject names are required";
      return;
    }
    $("rc-import-progress").textContent = "importing…";
    // crop on import (reference: label_train_page.py crop_data {x,y,w,h,apply})
    let importCrop = null;
    if ($("rc-imp-crop").checked) {
      const f = (id, dflt) => {
        const v = parseFloat($(id).value);
        return Number.isFinite(v) ? v : dflt;
      };
      const box = [f("rc-imp-crop-x", 0), f("rc-imp-crop-y", 0), f("rc-imp-crop-w", 1), f("rc-imp-crop-h", 1)];
      if (!(box[0] === 0 && box[1] === 0 && box[2] === 1 && box[3] === 1)) importCrop = box;
    }
    const imported = await rpcKw("import_videos", [sources, impSession, impSubject], {
      standardize: $("rc-imp-std").checked,
      stretch: $("rc-imp-stretch").checked,
      crop: importCrop,
    });
    $("rc-import-progress").textContent = `imported ${imported.length} file(s); queued for encoding`;
  };

  document.addEventListener("page:record", refreshCameras);
  document.addEventListener("project:loaded", refreshCameras);
})();
