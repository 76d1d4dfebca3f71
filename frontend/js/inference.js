// Inference page: model + recording-directory selection -> start_classification.
"use strict";
(() => {
  const $ = (id) => document.getElementById(id);

  async function refresh() {
    const [models, tree, live] = await Promise.all([
      rpc("get_available_models"),
      rpc("get_recording_tree"),
      rpc("get_live_inference_status"),
    ]);
    if (live && live.model) {
      $("if-live").checked = true;
      $("if-status").textContent =
        `live model: ${live.model} (${live.queued} file(s) queued)`;
    }
    const sel = $("if-model");
    const current = sel.value;
    sel.innerHTML = "";
    models.forEach((m) => sel.appendChild(new Option(m, m)));
    if (models.includes(current)) sel.value = current;

    const dirs = $("if-dirs");
    dirs.innerHTML = "";
    const root = await rpc("get_project_root");
    Object.entries(tree).forEach(([session, subjects]) => {
      const card = document.createElement("div");
      card.className = "card";
      card.innerHTML = `<h3><label><input type="checkbox" data-session="${esc(session)}"> ${esc(session)}</label></h3>`;
      Object.keys(subjects).forEach((subj) => {
        const l = document.createElement("label");
        const path = `${root}/recordings/${session}/${subj}`;
        l.innerHTML = `<input type="checkbox" data-dir="${esc(path)}"> ${esc(subj)}`;
        card.appendChild(l);
      });
      card.querySelector("[data-session]").onchange = (e) => {
        card.querySelectorAll("[data-dir]").forEach((c) => (c.checked = e.target.checked));
        updateRunButton();
      };
      card.querySelectorAll("[data-dir]").forEach((c) => (c.onchange = updateRunButton));
      dirs.appendChild(card);
    });
    updateRunButton();
  }

  // Run is disabled until a model and at least one directory are selected
  // (reference: inference_page.js updateStartButtonState).
  function updateRunButton() {
    const anyDir = !!document.querySelector("#if-dirs [data-dir]:checked");
    $("if-run").disabled = !($("if-model").value && anyDir);
  }
  $("if-model").onchange = updateRunButton;

  bus.on("updateInferenceProgress", (model, pct, message) => {
    $("if-bar-fill").style.width = pct + "%";
    $("if-status").textContent = `[${model}] ${message}`;
  });
  bus.on("notify_new_data_available", () => {
    $("if-status").textContent += "\nnew predictions available";
  });

  $("if-refresh").onclick = refresh;
  $("if-run").onclick = async () => {
    const dirs = [...document.querySelectorAll("#if-dirs [data-dir]:checked")].map(
      (c) => c.dataset.dir
    );
    if (!dirs.length) {
      $("if-status").textContent = "select at least one directory";
      return;
    }
    const n = await rpc("start_classification", $("if-model").value, dirs);
    $("if-status").textContent = `queued ${n} file(s)`;
  };
  $("if-live").onchange = (e) =>
    rpc("set_live_inference_model", e.target.checked ? $("if-model").value : null);

  document.addEventListener("page:infer", refresh);
  document.addEventListener("project:loaded", refresh);
})();
