// Record page: camera cards, recording control, live preview, video import.
"use strict";
(() => {
  const $ = (id) => document.getElementById(id);
  let activeStreams = [];

  async function refreshCameras() {
    const [cams, streams, sessions] = await Promise.all([
      rpc("get_camera_list"),
      rpc("get_active_streams"),
      rpc("get_existing_session_names"),
    ]);
    activeStreams = streams;
    $("rc-sessions").innerHTML = sessions
      .map((s) => `<option value="${s}">`)
      .join("");
    const cards = $("rc-cards");
    cards.innerHTML = "";
    cams.forEach((cam) => cards.appendChild(cameraCard(cam)));
  }

  function cameraCard(cam) {
    const card = document.createElement("div");
    card.className = "card";
    const recording = activeStreams.includes(cam.name);
    card.innerHTML = `
      <h3>${cam.name} ${recording ? '<span class="rec">● REC</span>' : ""}</h3>
      <img data-thumb="${cam.name}" alt="">
      <div class="muted">${cam.rtsp_url || "no URL"}</div>
      <div class="formrow">
        fps <input size="2" value="${cam.framerate}" data-f="framerate">
        res <input size="3" value="${cam.resolution}" data-f="resolution">
        seg(s) <input size="4" value="${cam.segment_seconds}" data-f="segment_seconds">
      </div>
      <div class="formrow">
        crop x <input size="3" value="${cam.crop_left_x}" data-f="crop_left_x">
        y <input size="3" value="${cam.crop_top_y}" data-f="crop_top_y">
        w <input size="3" value="${cam.crop_width}" data-f="crop_width">
        h <input size="3" value="${cam.crop_height}" data-f="crop_height">
      </div>
      <div class="formrow">
        <button data-act="save">Save</button>
        <button data-act="rec">${recording ? "Stop" : "Record"}</button>
        <button data-act="preview">Preview</button>
        <button data-act="del" class="danger">Delete</button>
      </div>`;
    card.querySelector('[data-act="save"]').onclick = async () => {
      const settings = { rtsp_url: cam.rtsp_url };
      card.querySelectorAll("[data-f]").forEach((inp) => {
        const v = parseFloat(inp.value);
        // empty/invalid input -> keep the camera's current value (NaN would
        // serialize to null and crash CameraSettings validation server-side)
        settings[inp.dataset.f] = Number.isFinite(v) ? v : cam[inp.dataset.f];
      });
      try {
        await rpc("save_camera_settings", cam.name, settings);
      } catch (e) {
        alert("save failed: " + e.message);
      }
      refreshCameras();
    };
    card.querySelector('[data-act="rec"]').onclick = async () => {
      if (activeStreams.includes(cam.name)) {
        await rpc("stop_camera_stream", cam.name);
      } else {
        const session = $("rc-session").value.trim() || "session1";
        await rpc("start_camera_stream", cam.name, session);
      }
      refreshCameras();
    };
    card.querySelector('[data-act="preview"]').onclick = async () => {
      $("rc-preview-label").textContent = `previewing ${cam.name} (30 s auto-stop)…`;
      await rpc("start_live_preview", cam.name);
    };
    card.querySelector('[data-act="del"]').onclick = async () => {
      if (confirm(`Delete camera ${cam.name}?`)) {
        await rpc("delete_camera", cam.name);
        refreshCameras();
      }
    };
    return card;
  }

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
  $("rc-import").onclick = async () => {
    const sources = $("rc-import-paths").value.split("\n").map((s) => s.trim()).filter(Boolean);
    if (!sources.length) return;
    $("rc-import-progress").textContent = "importing…";
    const imported = await rpcKw("import_videos", [sources, $("rc-imp-session").value, $("rc-imp-subject").value], {
      standardize: $("rc-imp-std").checked,
      stretch: $("rc-imp-stretch").checked,
    });
    $("rc-import-progress").textContent = `imported ${imported.length} file(s); queued for encoding`;
  };

  document.addEventListener("page:record", refreshCameras);
  document.addEventListener("project:loaded", refreshCameras);
})();
