// Label/Train page: dataset cards, the keyboard-driven labeling UI, label
// hygiene tools, and the training dialog. Mirrors the reference page's
// behavior (dataset cards with metric tables, two-press labeling, scrub
// speed doubling, review-and-correct preload) against this backend's API.
"use strict";
(() => {
  const $ = (id) => document.getElementById(id);
  let session = null; // latest updateLabelImageSrc payload
  let scrubSpeed = 1;

  // ---------- dataset cards ----------
  let dsConfigs = {}; // latest load_dataset_configs payload (weights panel reads it)

  async function refreshDatasets() {
    const [configs, models] = await Promise.all([
      rpc("load_dataset_configs"),
      rpc("get_available_models"),
    ]);
    dsConfigs = configs || {};
    const cards = $("lt-cards");
    cards.innerHTML = "";
    const dsSelects = [$("lt-ds-select"), $("tr-ds")];
    dsSelects.forEach((s) => (s.innerHTML = ""));
    Object.entries(configs).forEach(([name, cfg]) => {
      cards.appendChild(datasetCard(name, cfg));
      dsSelects.forEach((s) => s.appendChild(new Option(name, name)));
    });
    const ms = $("lt-model-select");
    ms.innerHTML = "";
    models.forEach((m) => ms.appendChild(new Option(m, m)));
    refreshVideoList();
  }

  function datasetCard(name, cfg) {
    const card = document.createElement("div");
    card.className = "card";
    const behaviors = cfg.behaviors || [];
    const metrics = cfg.metrics || {};
    const cols = ["Train Inst (Frames)", "Test Inst (Frames)", "F1 Score", "Precision", "Recall"];
    let rows = behaviors
      .map((b) => {
        const m = metrics[b] || {};
        return `<tr><td>${esc(b)}</td>${cols
          .map((c) => `<td>${m[c] !== undefined ? esc(m[c]) : "–"}</td>`)
          .join("")}</tr>`;
      })
      .join("");
    card.innerHTML = `
      <h3>${esc(name)}</h3>
      <table class="metrics">
        <tr><th></th><th>Train</th><th>Test</th><th>F1</th><th>P</th><th>R</th></tr>
        ${rows}
      </table>
      <div class="formrow">
        <button data-act="label">Label</button>
        <button data-act="train">Train</button>
        <button data-act="manage">Manage</button>
        <button data-act="whitelist">Whitelist</button>
        <button data-act="review">Review by behavior</button>
        <button data-act="disagree">Disagreements</button>
        ${name.endsWith("_aug") ? '<button data-act="sync">Sync labels</button>' : ""}
      </div>`;
    // card-level Label/Train shortcuts: prefill the dataset selects and jump
    // to the section (reference cards carry Label/Train buttons directly,
    // label_train_page.js loadInitialDatasetCards)
    card.querySelector('[data-act="label"]').onclick = async () => {
      $("lt-ds-select").value = name;
      await refreshVideoList();
      $("lt-ds-select").scrollIntoView({ behavior: "smooth" });
    };
    card.querySelector('[data-act="train"]').onclick = () => {
      $("tr-ds").value = name;
      $("tr-ds").scrollIntoView({ behavior: "smooth" });
    };
    card.querySelector('[data-act="manage"]').onclick = () => showManageModal(name);
    card.querySelector('[data-act="whitelist"]').onclick = () => showWhitelistModal(name, cfg.whitelist || []);
    card.querySelector('[data-act="review"]').onclick = () => showReviewByBehaviorModal(name, behaviors);
    card.querySelector('[data-act="disagree"]').onclick = () => showDisagreementModal(name);
    const sync = card.querySelector('[data-act="sync"]');
    if (sync)
      sync.onclick = async () => {
        const n = await rpc("sync_augmented_dataset", name);
        alert(`${n} label instance(s) synced from the source dataset.`);
        refreshDatasets();
      };
    return card;
  }

  // Manage modal: dataset folder path, clean & sort, recount, delete —
  // reference: label_train_page.js showManageDatasetModal.
  async function showManageModal(name) {
    const body = showModal(`Manage dataset: ${name}`);
    const path = await rpc("reveal_dataset_files", name);
    body.innerHTML = `
      <p class="muted">files: <code>${esc(path || "?")}</code></p>
      <div class="formrow">
        <button id="mm-clean">Clean &amp; sort labels</button>
        <button id="mm-recalc">Recount instances / frames</button>
        <button id="mm-delete" class="danger">Delete dataset</button>
      </div>
      <pre id="mm-out" class="muted"></pre>`;
    $("mm-clean").onclick = async () => {
      await rpc("clean_and_sort_labels", name);
      $("mm-out").textContent = "labels cleaned and sorted";
      refreshDatasets();
    };
    $("mm-recalc").onclick = async () => {
      $("mm-out").textContent = "recounting…";
      await rpc("recalculate_dataset_stats", name);
      $("mm-out").textContent = "recounted";
      refreshDatasets();
    };
    $("mm-delete").onclick = async () => {
      if (!confirm(`Delete dataset ${name}? Labels will be lost.`)) return;
      await rpc("delete_dataset", name);
      closeModal();
      refreshDatasets();
    };
  }

  // Whitelist editor: checkbox tree of session/subject recording dirs —
  // reference: label_train_page.js showEditWhitelistModal.
  async function showWhitelistModal(name, current) {
    const body = showModal(`Recording whitelist: ${name}`);
    const tree = await rpc("get_record_tree");
    const chosen = new Set(current);
    body.innerHTML = `
      <p class="muted">Checked recordings are eligible for this dataset
      (empty selection = all recordings).</p>
      <div id="wl-tree"></div>
      <div class="formrow"><button id="wl-save">Save whitelist</button></div>`;
    const treeDiv = $("wl-tree");
    Object.entries(tree).forEach(([sess, subjects]) => {
      const sessDiv = document.createElement("div");
      sessDiv.innerHTML = `<label><input type="checkbox" data-wl="${esc(sess)}"> <b>${esc(sess)}</b></label>`;
      const sessBox = sessDiv.querySelector("input");
      const sub = document.createElement("div");
      sub.className = "tree";
      subjects.forEach((s) => {
        const key = `${sess}/${s}`;
        const l = document.createElement("label");
        l.style.display = "block";
        l.innerHTML = `<input type="checkbox" data-wl="${esc(key)}"> ${esc(s)}`;
        sub.appendChild(l);
      });
      sessDiv.appendChild(sub);
      treeDiv.appendChild(sessDiv);
      // session checkbox toggles all subjects under it (reference:
      // updateChildrenCheckboxes)
      sessBox.onchange = (e) => {
        sub.querySelectorAll("input").forEach((c) => (c.checked = e.target.checked));
      };
    });
    treeDiv.querySelectorAll("input[data-wl]").forEach((c) => {
      c.checked = chosen.has(c.dataset.wl);
    });
    $("wl-save").onclick = async () => {
      const wl = [...treeDiv.querySelectorAll("input[data-wl]:checked")]
        .map((c) => c.dataset.wl)
        // a checked session implies its subjects; keep only the finest grain
        .filter((w) => w.includes("/"));
      await rpc("update_dataset_whitelist", name, wl);
      closeModal();
      refreshDatasets();
    };
  }

  // Review-by-behavior playlist: pick a behavior, list videos carrying its
  // instances, click to open a labeling session filtered to that behavior —
  // reference: showReviewByCategoryModal + buildAndShowPlaylist.
  async function showReviewByBehaviorModal(name, behaviors) {
    const body = showModal(`Review by behavior: ${name}`);
    body.innerHTML = `
      <div class="formrow">
        behavior <select id="rb-beh">${behaviors.map((b) => `<option>${esc(b)}</option>`).join("")}</select>
        <button id="rb-go">Build playlist</button>
      </div>
      <div id="rb-list"></div>`;
    $("rb-go").onclick = async () => {
      const beh = $("rb-beh").value;
      const byVideo = await rpc("get_instances_for_behavior", name, beh);
      const list = $("rb-list");
      list.innerHTML = "";
      const entries = Object.entries(byVideo);
      if (!entries.length) list.innerHTML = `<p class="muted">no instances of ${esc(beh)}</p>`;
      const reviewed = JSON.parse(sessionStorage.getItem("categoryReviewedVideos") || "[]");
      entries.forEach(([video, insts]) => {
        const frames = insts.reduce((a, i) => a + (i.end - i.start + 1), 0);
        const item = document.createElement("div");
        item.className = "list-item";
        const done = reviewed.includes(video);
        item.innerHTML = `<span>${esc(video.split("/").slice(-2).join("/"))}</span>
          <span class="muted">${insts.length} inst · ${frames} frames${done ? " · ✓ reviewed" : ""}</span>`;
        // reviewed videos stay listed but are not clickable (reference:
        // buildAndShowPlaylist, label_train_page.js:709-737)
        if (!done)
          item.onclick = async () => {
            closeModal();
            // 3rd slot is preloaded_instances in the reference-shaped
            // signature; the behavior filter rides 4th
            await rpc("start_labeling", name, video, null, beh);
          };
        list.appendChild(item);
      });
    };
  }

  // Disagreement review queue: model-vs-labels disagreements ranked by model
  // confidence; click opens a review session on that video — reference:
  // showDisagreementModal (label_train_page.js:206).
  async function showDisagreementModal(name) {
    const body = showModal(`Label/model disagreements: ${name}`);
    const playlist = await rpc("get_disagreement_playlist", name);
    if (!playlist.length) {
      body.innerHTML = `<p class="muted">No disagreement report found — train a
        model on this dataset first (the trainer writes
        disagreement_report.yaml).</p>`;
      return;
    }
    const model = $("lt-model-select").value;
    body.innerHTML = `<p class="muted">One highest-confidence disagreement per
      video; click to review with model guidance.</p><div id="dg-list"></div>`;
    const list = $("dg-list");
    playlist.forEach((item) => {
      const el = document.createElement("div");
      el.className = "list-item";
      const conf = item.model_confidence !== undefined
        ? `${(item.model_confidence * 100).toFixed(0)}%` : "?";
      el.innerHTML = `<span>${esc(String(item.video_path).split("/").slice(-2).join("/"))}
        · ${esc(item.labeled_behavior || "?")} vs model ${esc(item.model_behavior || "?")}</span>
        <span class="muted">conf ${conf}</span>`;
      el.onclick = async () => {
        closeModal();
        await rpc("start_labeling_with_preload", name, model, item.video_path,
                  parseInt($("lt-smooth").value, 10));
      };
      list.appendChild(el);
    });
  }

  async function refreshVideoList() {
    // The labeling list is scoped to the selected dataset's recording
    // whitelist (reference: get_hierarchical_video_list filters by it);
    // the visualize page's picker is owned by visualize.js (scoped to
    // classified videos instead).
    const ds = $("lt-ds-select").value || null;
    const scoped = await rpc("get_hierarchical_video_list", ds);
    const sel = $("lt-video-select");
    sel.innerHTML = "";
    Object.entries(scoped).forEach(([sess, subjects]) => {
      Object.entries(subjects).forEach(([subj, vids]) => {
        vids.forEach((v) => {
          const label = `${sess}/${subj}/${v.path.split("/").pop()}` +
            (v.has_labels ? " ✓" : "") + (v.encoded ? "" : " (not encoded)");
          sel.appendChild(new Option(label, v.path));
        });
      });
    });
  }
  $("lt-ds-select").onchange = refreshVideoList;

  // ---------- labeling ----------
  bus.on("buildLabelingUI", () => {
    $("lt-labeling").classList.remove("hidden");
    $("lt-frame").focus();
  });
  bus.on("setLabelingModeUI", (mode, model) => {
    $("lt-mode-badge").textContent =
      mode === "review" ? `review: ${model}`
      : mode === "playback" ? `playback (read-only): ${model}`
      : "from scratch";
    // Playback rejects every edit server-side; grey the controls out so the
    // UI doesn't invite labeling that silently does nothing.
    const readOnly = mode === "playback";
    ["lt-save", "lt-refilter"].forEach((id) => ($(id).disabled = readOnly));
    $("lt-labeling").classList.toggle("playback", readOnly);
  });
  bus.on("showErrorOnLabelTrainPage", (msg) => {
    const pre = $("lt-report");
    pre.classList.remove("hidden");
    pre.textContent = "ERROR: " + msg;
  });
  bus.on("refreshAllDatasets", refreshDatasets);
  // backend emits (label, confidence) — labeling.py:203
  bus.on("updateConfidenceBadge", (label, conf) => {
    $("lt-conf-badge").textContent =
      conf === null || conf === undefined ? "" : `instance confidence: ${(conf * 100).toFixed(0)}%`;
  });
  // backend emits the behavior label string (or null to clear) — labeling.py:202.
  // The label is kept in state and applied by drawBehaviorTable, because the
  // backend emits this BEFORE updateLabelImageSrc rebuilds the table (a class
  // toggled directly here would be wiped by the innerHTML rebuild).
  let highlightedBehavior = null;
  bus.on("highlightBehaviorRow", (label) => {
    highlightedBehavior = label === undefined ? null : label;
    if (session) applyBehaviorHighlight(session);
  });
  function applyBehaviorHighlight(p) {
    const idx = highlightedBehavior === null ? -1 : p.behaviors.indexOf(highlightedBehavior);
    document.querySelectorAll("#lt-behavior-table tr").forEach((tr, i) => {
      // row 0 is the header; idx -1 (cleared / unknown label) highlights nothing
      tr.classList.toggle("hl", idx >= 0 && i - 1 === idx);
    });
  }
  bus.on("update_augmentation_progress", (pct, msg) => {
    const pre = $("lt-report");
    if (pct < 0) {
      // completion sentinel (api.py finally block): keep whatever report or
      // error message is already showing instead of overwriting it
      if (pre.textContent.startsWith("augmenting:")) {
        pre.textContent = "augmentation finished";
        refreshDatasets();
      }
      return;
    }
    pre.classList.remove("hidden");
    pre.textContent = `augmenting: ${pct}% ${msg || ""}`;
  });

  bus.on("updateLabelImageSrc", (payload) => {
    session = payload;
    if (payload.frame) $("lt-frame").src = "data:image/jpeg;base64," + payload.frame;
    // pending.type is -1 when no label is in progress (labeling.py sentinel)
    $("lt-frameinfo").textContent =
      `frame ${payload.frame_index + 1}/${payload.total_frames}` +
      (payload.pending && payload.pending.type >= 0
        ? ` · pending ${payload.behaviors[payload.pending.type]} from ${payload.pending.start}`
        : "") + ` · speed ×${scrubSpeed}`;
    drawTimeline(payload);
    drawZoomTimeline(payload);
    drawBehaviorTable(payload);
    updateCommitButtons(payload);
  });

  // Draw one raster strip; frame->x mapping is relative to [lo, hi).
  function drawRaster(cv, p, raster, lo, hi) {
    const ctx = cv.getContext("2d");
    const W = cv.width, H = cv.height;
    const span = Math.max(1e-9, hi - lo);
    ctx.fillStyle = "#111";
    ctx.fillRect(0, 0, W, H);
    const n = (raster && raster.length) || 1;
    for (let i = 0; i < n; i++) {
      if (!raster || raster[i] < 0) continue;
      ctx.fillStyle = cssColor(p.colors[raster[i]]);
      ctx.fillRect((i * W) / n, 6, W / n + 1, H - 18);
    }
    // selection box
    if (p.selected) {
      const x0 = ((p.selected.start - lo) / span) * W;
      const x1 = ((p.selected.end + 1 - lo) / span) * W;
      if (x1 > 0 && x0 < W) {
        ctx.strokeStyle = "#fff";
        ctx.lineWidth = 2;
        ctx.strokeRect(x0, 4, Math.max(2, x1 - x0), H - 14);
      }
    }
    // playhead
    const x = ((p.frame_index - lo) / span) * W;
    if (x >= 0 && x <= W) {
      ctx.fillStyle = "#ff5252";
      ctx.fillRect(x - 1, 0, 2, H);
    }
  }

  function drawTimeline(p) {
    drawRaster($("lt-timeline"), p, p.timeline, 0, p.total_frames);
    // zoom-window extent marker on the full strip
    if (p.zoom_end !== undefined) {
      const cv = $("lt-timeline");
      const ctx = cv.getContext("2d");
      const x0 = (p.zoom_start / p.total_frames) * cv.width;
      const x1 = (p.zoom_end / p.total_frames) * cv.width;
      ctx.strokeStyle = "rgba(255,255,255,0.45)";
      ctx.lineWidth = 1;
      ctx.strokeRect(x0, 0.5, Math.max(2, x1 - x0), cv.height - 1);
    }
  }

  // Fixed-width ~10% zoom strip centered by the backend on the selection or
  // playhead (reference renders both timelines each frame).
  function drawZoomTimeline(p) {
    const cv = $("lt-timeline-zoom");
    if (!cv || p.zoom_timeline === undefined) return;
    drawRaster(cv, p, p.zoom_timeline, p.zoom_start, p.zoom_end);
  }

  function cssColor(c) {
    if (Array.isArray(c)) return `rgb(${c[2]},${c[1]},${c[0]})`; // BGR (OpenCV) -> CSS
    return c || "#888";
  }

  // Key badge for behavior i: 1-9, then a-z for behaviors 10+ (reference:
  // label_train_page.js:1082 builds the same map).
  function behaviorKey(i) {
    return i < 9 ? String(i + 1) : String.fromCharCode(97 + (i - 9));
  }

  function drawBehaviorTable(p) {
    const t = $("lt-behavior-table");
    const counts = p.counts || {};
    const instCounts = p.instance_counts || {};
    // "inst / frames" per behavior — reference updateLabelingStats
    // (label_train_page.js:939-943)
    t.innerHTML =
      "<tr><th>key</th><th>behavior</th><th>inst / frames</th></tr>" +
      p.behaviors
        .map(
          (b, i) =>
            `<tr><td>${behaviorKey(i)}</td><td><span class="swatch" style="background:${cssColor(
              p.colors[i]
            )}"></span>${esc(b)}</td><td>${instCounts[b] || 0} / ${counts[b] || 0}</td></tr>`
        )
        .join("");
    applyBehaviorHighlight(p);
  }

  // keyboard map (reference: frontend/js/label_train_page.js keydown handler)
  document.addEventListener("keydown", async (e) => {
    if ($("lt-labeling").classList.contains("hidden")) return;
    if (document.activeElement && /INPUT|TEXTAREA|SELECT/.test(document.activeElement.tagName)) return;
    const k = e.key;
    if (e.ctrlKey && k.toLowerCase() === "s") {
      e.preventDefault();
      return saveLabels();
    }
    if (e.ctrlKey && k.toLowerCase() === "z") {
      e.preventDefault();
      return rpc("pop_instance_from_buffer");
    }
    // ctrl+shift+arrows hop to the prev/next video in the session
    // (reference: label_train_page.js:2500-2507)
    if (e.ctrlKey && e.shiftKey && k === "ArrowRight") { e.preventDefault(); return rpc("next_video", 1); }
    if (e.ctrlKey && e.shiftKey && k === "ArrowLeft") { e.preventDefault(); return rpc("next_video", -1); }
    if (k === "ArrowRight") { e.preventDefault(); return rpc("next_frame", scrubSpeed); }
    if (k === "ArrowLeft") { e.preventDefault(); return rpc("next_frame", -scrubSpeed); }
    if (k === "ArrowUp") { e.preventDefault(); scrubSpeed = Math.min(scrubSpeed * 2, 128); return refreshInfo(); }
    if (k === "ArrowDown") { e.preventDefault(); scrubSpeed = Math.max(1, Math.trunc(scrubSpeed / 2)); return refreshInfo(); }
    if (k === "Tab") { e.preventDefault(); return rpc("jump_to_instance", e.shiftKey ? -1 : 1); }
    if (k === "[") return rpc("update_instance_boundary", "start");
    if (k === "]") return rpc("update_instance_boundary", "end");
    if (k === "Enter") return rpc("confirm_selected_instance");
    if (k === "Escape") return rpc("cancel_commit_stage");
    if (k === "Delete") return rpc("delete_instance_from_buffer");
    if (k === "Backspace") return rpc("pop_instance_from_buffer");
    if (e.ctrlKey || e.metaKey || e.altKey) return;
    // behavior hotkeys: 1-9 for the first nine, a-z for behaviors 10+
    // (reference: label_train_page.js:2525-2537)
    if (/^[1-9]$/.test(k)) return rpc("label_frame", parseInt(k, 10) - 1);
    if (/^[a-z]$/i.test(k) && k.length === 1) {
      const idx = k.toLowerCase().charCodeAt(0) - 97 + 9;
      if (session && idx < session.behaviors.length) return rpc("label_frame", idx);
    }
  });

  function refreshInfo() {
    if (session) bus.emit("updateLabelImageSrc", [session]);
  }

  $("lt-frame").onclick = (e) => {
    const r = e.target.getBoundingClientRect();
    rpc("handle_click_on_label_image",
        Math.round(((e.clientX - r.left) / r.width) * 500),
        Math.round(((e.clientY - r.top) / r.height) * 500));
  };
  // Click jumps; holding the button drags the playhead (reference:
  // handleMouseMoveForLabelScrub wired on mousedown, label_train_page.js:2370).
  // An in-flight flag drops intermediate moves so the RPC stream can't
  // outrun the server-side renderer.
  let scrubBusy = false;
  const scrubTo = async (e) => {
    if (!session || scrubBusy) return;
    const r = $("lt-timeline").getBoundingClientRect();
    const frac = Math.min(1, Math.max(0, (e.clientX - r.left) / r.width));
    scrubBusy = true;
    try { await rpc("jump_to_frame", Math.floor(frac * session.total_frames)); }
    finally { scrubBusy = false; }
  };
  $("lt-timeline").onmousedown = (e) => {
    e.preventDefault();
    scrubTo(e);
    document.addEventListener("mousemove", scrubTo);
    document.addEventListener(
      "mouseup", () => document.removeEventListener("mousemove", scrubTo),
      { once: true });
  };
  // double-click recenters the zoom strip on the selected instance
  // (reference: get_zoom_range_for_click on the timeline canvas)
  $("lt-timeline").ondblclick = (e) => {
    const r = e.target.getBoundingClientRect();
    rpc("get_zoom_range_for_click",
        Math.round(((e.clientX - r.left) / r.width) * 500));
  };
  // video size toggle (reference: toggleVideoSize)
  $("lt-size").onclick = () => $("lt-frame").classList.toggle("size-lg");
  // typed frame jump (reference: jumpToFrame + frame-jump-input,
  // label_train_page.js:1388-1394 — Enter in the input or the Go button)
  const jumpTyped = () => {
    const n = parseInt($("lt-jump-input").value, 10);
    if (!isNaN(n)) rpc("jump_to_frame", n);
  };
  $("lt-jump-go").onclick = jumpTyped;
  $("lt-jump-input").addEventListener("keydown", (e) => {
    if (e.key === "Enter") { e.preventDefault(); jumpTyped(); }
  });
  $("lt-timeline-zoom").onclick = (e) => {
    if (!session || session.zoom_end === undefined) return;
    const r = e.target.getBoundingClientRect();
    const frac = (e.clientX - r.left) / r.width;
    const f = session.zoom_start + frac * (session.zoom_end - session.zoom_start);
    rpc("jump_to_frame", Math.floor(f));
  };

  // Two-step commit like the reference (label_train_page.js:1284-1305
  // setConfirmationModeUI + handleCommitClick): the first press STAGES —
  // unconfirmed predictions leave the timeline so the user sees exactly
  // what will be written — and the second press saves. Escape or the
  // cancel button un-stages. The server's render payload carries
  // confirmation_mode, so the buttons always reflect backend state.
  async function saveLabels() {
    if (!(session && session.confirmation_mode)) {
      await rpc("stage_for_commit");
      return;
    }
    const r = await rpc("save_session_labels");
    const pre = $("lt-report");
    pre.classList.remove("hidden");
    pre.textContent = "saved: " + JSON.stringify(r);
    refreshDatasets();
  }
  $("lt-save").onclick = saveLabels;
  $("lt-cancel-commit").onclick = () => rpc("cancel_commit_stage");
  function updateCommitButtons(p) {
    $("lt-save").textContent = p.confirmation_mode
      ? "Confirm & save (Ctrl+S)" : "Save labels (Ctrl+S)";
    $("lt-cancel-commit").classList.toggle("hidden", !p.confirmation_mode);
  }
  // Mark the open video done without committing changes — stored client-side
  // in sessionStorage so the review playlist can badge it (reference:
  // handleMarkAsReviewed, label_train_page.js:1353-1377).
  $("lt-reviewed").onclick = async () => {
    const path = await rpc("get_current_labeling_video_path");
    if (!path) return;
    const reviewed = JSON.parse(sessionStorage.getItem("categoryReviewedVideos") || "[]");
    if (!reviewed.includes(path)) reviewed.push(path);
    sessionStorage.setItem("categoryReviewedVideos", JSON.stringify(reviewed));
    $("lt-labeling").classList.add("hidden");
  };
  $("lt-close").onclick = () => $("lt-labeling").classList.add("hidden");
  // Mode matches the reference's below/above radio pair (reference:
  // frontend/js/label_train_page.js:1215-1246): "below" keeps predictions the
  // model is UNSURE about (confidence <= thr, the review-the-doubtful flow),
  // "above" keeps confident ones (spot-check flow).
  $("lt-refilter").onclick = () =>
    rpc("refilter_instances", parseInt($("lt-filter-thr").value, 10),
        $("lt-filter-mode").value);

  $("lt-start").onclick = () =>
    rpc("start_labeling", $("lt-ds-select").value, $("lt-video-select").value);
  $("lt-start-review").onclick = async () => {
    // Videos that already carry human labels get an explicit confirm before
    // a review session (reference: startPreLabeling's video_has_labels
    // check, label_train_page.js:1677-1691): committing the session later
    // rewrites that video's entries in labels.yaml.
    const video = $("lt-video-select").value;
    if (await rpc("video_has_labels", video)) {
      const msg =
        "This video already contains human-verified labels.\n\n" +
        "A Review & Correct session loads your existing labels alongside " +
        "the model's new predictions; committing corrections will rewrite " +
        "this video's labels with the combined set.\n\nProceed?";
      if (!confirm(msg)) return;
    }
    await rpc("start_labeling_with_preload",
        $("lt-ds-select").value, $("lt-model-select").value,
        video, parseInt($("lt-smooth").value, 10));
  };

  // hygiene tools
  const report = (r) => {
    const pre = $("lt-report");
    pre.classList.remove("hidden");
    pre.textContent = typeof r === "string" ? r : JSON.stringify(r, null, 1);
  };
  $("lt-coverage").onclick = () =>
    rpc("get_label_coverage_report", $("lt-ds-select").value).then(report);
  $("lt-conflicts").onclick = () =>
    rpc("analyze_label_conflicts", $("lt-ds-select").value).then(report);
  $("lt-clean").onclick = () =>
    rpc("clean_and_sort_labels", $("lt-ds-select").value).then(() => report("labels cleaned"));
  $("lt-augment").onclick = () => {
    const src = $("lt-ds-select").value;
    rpc("create_augmented_dataset", src, src + "_aug").then(() => report("augmentation started"));
  };
  $("lt-create").onclick = async () => {
    const name = $("lt-new-name").value.trim();
    const behaviors = $("lt-new-behaviors").value.split(",").map((s) => s.trim()).filter(Boolean);
    if (!name || !behaviors.length) return;
    await rpc("create_dataset", name, behaviors, []);
    $("lt-new-name").value = "";
    refreshDatasets();
  };
  $("lt-refresh").onclick = refreshDatasets;

  // ---------- training ----------
  bus.on("updateTrainingStatusOnUI", (dataset, message) => {
    $("tr-status").textContent = `[${dataset}] ${message}`;
  });
  // Custom class weights: per-behavior inputs shown when the method is
  // custom_weights (reference label-train.html:543-548 ships the panel but
  // never populates it; here the suggested weight is derived from the last
  // run's F1 — behaviors the model struggles on get proportionally more
  // loss weight, normalized so the mean stays 1.0).
  function rebuildWeightsPanel() {
    const panel = $("tr-weights");
    const show = $("tr-method").value === "custom_weights";
    panel.classList.toggle("hidden", !show);
    if (!show) return;
    const cfg = dsConfigs[$("tr-ds").value] || {};
    const behaviors = cfg.behaviors || [];
    const metrics = cfg.metrics || {};
    const raw = behaviors.map((b) => {
      const f1 = parseFloat((metrics[b] || {})["F1 Score"]);
      return isNaN(f1) ? 1.0 : 1.0 / Math.max(f1, 0.05);
    });
    const mean = raw.reduce((a, v) => a + v, 0) / (raw.length || 1);
    panel.innerHTML = behaviors.length
      ? behaviors
          .map(
            (b, i) =>
              `<label>${esc(b)} <input class="tr-weight" data-behavior="${esc(b)}"
                 type="number" step="0.1" min="0"
                 value="${(raw[i] / (mean || 1)).toFixed(2)}"></label>`
          )
          .join("")
      : "<em>no behaviors in dataset</em>";
  }
  $("tr-method").onchange = rebuildWeightsPanel;
  $("tr-ds").onchange = rebuildWeightsPanel;

  $("tr-train").onclick = async () => {
    // H5-readiness gate first (reference: label_train_page.js:2212 —
    // check_dataset_files_ready before training; unencoded videos would
    // silently drop their labeled instances from the manifest).
    const [ready, readyMsg] = await rpc("check_dataset_files_ready", $("tr-ds").value);
    if (!ready) {
      $("tr-status").textContent = readyMsg || "dataset files not ready";
      return;
    }
    // Preflight next (reference: checkAndShowTrainModal runs the split
    // validity check before opening the dialog): warn-and-confirm instead of
    // silently training with an empty validation split.
    // test fraction is only reserved when the held-out-test box is checked
    // (mirrors orchestrator.default_split_ratios) — otherwise preflight
    // would validate ratios the training run won't use
    const pf = await rpc("run_preflight_check", $("tr-ds").value,
                         $("tr-usetest").checked ? parseFloat($("tr-test").value) : 0);
    if (pf && pf.is_valid === false &&
        !confirm(`Preflight: ${pf.message || "split looks invalid"}\nTrain anyway?`))
      return;
    const kw = {
      sequence_length: parseInt($("tr-seq").value, 10),
      batch_size: parseInt($("tr-batch").value, 10),
      learning_rate: parseFloat($("tr-lr").value),
      epochs: parseInt($("tr-epochs").value, 10),
      patience: parseInt($("tr-patience").value, 10),
      lstm_hidden_size: parseInt($("tr-hidden").value, 10),
      lstm_layers: parseInt($("tr-layers").value, 10),
      weight_decay: parseFloat($("tr-wd").value),
      label_smoothing: parseFloat($("tr-smooth").value),
      num_runs: parseInt($("tr-runs").value, 10),
      num_trials: parseInt($("tr-trials").value, 10),
      test_split: parseFloat($("tr-test").value),
      use_test: $("tr-usetest").checked,
      training_method: $("tr-method").value,
      optimization_target: $("tr-target").value,
    };
    if (kw.training_method === "custom_weights") {
      const weights = {};
      document.querySelectorAll("#tr-weights .tr-weight").forEach((inp) => {
        const w = parseFloat(inp.value);
        if (inp.dataset.behavior && !isNaN(w)) weights[inp.dataset.behavior] = w;
      });
      if (!Object.keys(weights).length) {
        $("tr-status").textContent = "custom weights selected but no behaviors found";
        return;
      }
      kw.custom_weights = weights;
    }
    const ok = await rpcKw("train_model", [$("tr-ds").value], kw);
    $("tr-status").textContent = ok ? "queued…" : "could not queue (files ready?)";
  };
  $("tr-cancel").onclick = () => rpc("cancel_training_task", $("tr-ds").value);

  document.addEventListener("page:label", refreshDatasets);
  document.addEventListener("project:loaded", refreshDatasets);
})();
