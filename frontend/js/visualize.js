// Visualize page: actograms (stale-task-suppressed), binned CSV export,
// single-video ethograms.
"use strict";
(() => {
  const $ = (id) => document.getElementById(id);
  let taskCounter = 0;

  async function refresh() {
    const [models, datasets] = await Promise.all([
      rpc("get_available_models"),
      rpc("load_dataset_configs"),
    ]);
    const sel = $("vz-model");
    const cur = sel.value;
    sel.innerHTML = "";
    models.forEach((m) => sel.appendChild(new Option(m, m)));
    if (models.includes(cur)) sel.value = cur;
    const ds = $("vz-dataset");
    ds.innerHTML = "";
    Object.keys(datasets).forEach((d) => ds.appendChild(new Option(d, d)));
    await Promise.all([refreshSessions(), refreshBehaviorBoxes()]);
  }

  async function refreshSessions() {
    const model = $("vz-model").value;
    if (!model) return;
    const tree = await rpc("get_classified_video_tree", model);
    const s = $("vz-session");
    s.innerHTML = "";
    Object.keys(tree).forEach((sess) => s.appendChild(new Option(sess, sess)));
    await refreshSubjects(tree);
    refreshVideoPicker(tree);
  }

  // Ethogram/playback video picker, scoped to videos that actually have
  // predictions for the selected model (reference:
  // get_inferred_videos_for_session feeds the playback list,
  // label_train_page.js:1598) — both features need an outputs CSV.
  function refreshVideoPicker(tree) {
    const sel = $("vz-video");
    sel.innerHTML = "";
    Object.entries(tree || {}).forEach(([sess, subjects]) => {
      Object.entries(subjects).forEach(([subj, vids]) => {
        vids.forEach((v) =>
          sel.appendChild(new Option(`${sess}/${subj}/${v.split("/").pop()}`, v))
        );
      });
    });
  }

  async function refreshSubjects(tree) {
    const model = $("vz-model").value;
    tree = tree || (await rpc("get_classified_video_tree", model));
    const subjects = Object.keys(tree[$("vz-session").value] || {});
    const s = $("vz-subject");
    s.innerHTML = "";
    subjects.forEach((x) => s.appendChild(new Option(x, x)));
  }

  // Behavior checkbox list for the selected model (reference:
  // handleBehaviorSelection / per-behavior checkboxes, visualize_page.js:225)
  async function refreshBehaviorBoxes() {
    const configs = await rpc("get_model_configs");
    const cfg = configs[$("vz-model").value];
    const span = $("vz-behaviors-boxes");
    span.innerHTML = "";
    ((cfg && cfg.behaviors) || []).forEach((b) => {
      const lab = document.createElement("label");
      lab.innerHTML = `<input type="checkbox" class="vz-beh" value="${esc(b)}" checked> ${esc(b)}`;
      span.appendChild(lab);
    });
  }

  $("vz-model").onchange = () => {
    refreshSessions();
    refreshBehaviorBoxes();
  };
  $("vz-session").onchange = () => refreshSubjects();
  $("vz-refresh").onclick = refresh;

  // New classification CSVs landed: debounce 10 s of quiet, then reload the
  // project and rebuild the pickers (reference: notify_new_data_available,
  // visualize_page.js:80-114).
  let refreshDebounce = null;
  bus.on("notify_new_data_available", () => {
    clearTimeout(refreshDebounce);
    refreshDebounce = setTimeout(async () => {
      await rpc("reload_project_data");
      refresh();
    }, 10000);
  });

  bus.on("updateActogramDisplay", (results) => {
    const div = $("vz-actograms");
    div.innerHTML = "";
    Object.entries(results || {}).forEach(([behavior, b64]) => {
      const card = document.createElement("div");
      card.className = "card";
      card.style.maxWidth = "620px";
      card.innerHTML = `<h3>${esc(behavior)}</h3>`;
      const img = document.createElement("img");
      img.src = "data:image/png;base64," + b64;
      card.appendChild(img);
      div.appendChild(card);
    });
  });

  async function behaviorsArg() {
    const checked = [...document.querySelectorAll(".vz-beh:checked")].map((cb) => cb.value);
    if (checked.length) return checked;
    const configs = await rpc("get_model_configs");
    const cfg = configs[$("vz-model").value];
    return (cfg && cfg.behaviors) || [];
  }

  $("vz-generate").onclick = async () => {
    const root = (await rpc("get_project_root")) + "/recordings/" + $("vz-session").value;
    $("vz-actograms").innerHTML = '<span class="muted">generating…</span>';
    const task = ++taskCounter;
    let results;
    try {
      results = await rpc(
        "generate_actograms",
        root,
        $("vz-subject").value,
        $("vz-model").value,
        await behaviorsArg(),
        parseFloat($("vz-fps").value),
        parseInt($("vz-bin").value, 10),
        parseFloat($("vz-start").value),
        parseFloat($("vz-thr").value),
        $("vz-cycle").value,
        $("vz-acro").checked,
        task
      );
    } catch (e) {
      if (task === taskCounter)
        $("vz-actograms").textContent = "actogram failed: " + e.message;
      return;
    }
    // Success renders via the updateActogramDisplay SSE event; a null return
    // with no event means no stitched predictions exist for the selection
    // (api.py returns early without emitting). Only report it if this is
    // still the latest task — a superseded task also returns null, and its
    // successor's result must not be overwritten.
    if (results === null && task === taskCounter)
      $("vz-actograms").innerHTML =
        '<span class="muted">no classification outputs found for this ' +
        "session/subject/model — run inference first</span>";
  };

  $("vz-export").onclick = async () => {
    const root = (await rpc("get_project_root")) + "/recordings/" + $("vz-session").value;
    const path = await rpc(
      "generate_and_save_data",
      root,
      $("vz-subject").value,
      $("vz-model").value,
      await behaviorsArg(),
      parseFloat($("vz-fps").value),
      parseInt($("vz-bin").value, 10),
      parseFloat($("vz-thr").value)
    );
    if (!path) return alert("no data for selection");
    // Under the desktop shell, additionally offer a native save-as of the
    // generated CSV (reference save-file-to-disk, main.js:131-139).
    if (window.electronAPI && window.electronAPI.saveData) {
      const csv = await rpc("read_text_file", path);
      if (csv !== null)
        await window.electronAPI.saveData(path.split("/").pop(), csv);
      return;
    }
    alert("wrote " + path);
  };

  $("vz-ethogram").onclick = async () => {
    const video = $("vz-video").value;
    const model = $("vz-model").value;
    const preds = await rpc("get_predictions_for_video", video, model);
    if (!preds || !preds.csv_path) {
      $("vz-etho").innerHTML = '<span class="muted">no predictions CSV for this video/model</span>';
      return;
    }
    const b64 = await rpc("generate_ethogram", preds.csv_path, parseFloat($("vz-fps").value));
    $("vz-etho").innerHTML = b64
      ? `<img src="data:image/png;base64,${b64}">`
      : '<span class="muted">ethogram failed</span>';
  };

  $("vz-playback").onclick = async () => {
    // Read-only playback of predictions through the labeling renderer
    // (reference C29); reuses the label page's canvas + keyboard transport.
    const ok = await rpc(
      "start_playback_session",
      $("vz-dataset").value,
      $("vz-model").value,
      $("vz-video").value
    );
    if (ok) showPage("label");
    else alert("playback failed: does the video have predictions for this model?");
  };

  document.addEventListener("page:visualize", refresh);
  document.addEventListener("project:loaded", refresh);
})();
