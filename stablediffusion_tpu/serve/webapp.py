"""Web UI (the web-app/app.py analog — but actually wired to the pipeline).

The reference ships a Gradio skeleton whose generate button returns
placeholder URLs (web-app/app.py:4-6,366; SURVEY.md U3).  Here the UI is a
self-contained HTML/JS page served by the HTTP worker at GET /ui that posts
the same JSON job schema to POST /.  If `gradio` is installed,
`launch_gradio()` offers the same controls natively; the HTML path has no
extra dependencies.

Controls mirror the reference's surface (web-app/app.py:26-232): model
type/checkpoint/LoRAs with per-LoRA weights, task radio
(txt2img/img2img/inpaint), steps/cfg/clip-skip/seed/size/images-per-prompt
sliders, strength + image upload for non-txt2img, scheduler selector.
"""

from __future__ import annotations

from stablediffusion_tpu.schedulers import SCHEDULER_NAMES

_SCHED_OPTIONS = "".join(
    f'<option value="{n}">{n}</option>' for n in SCHEDULER_NAMES if n != "DDPM"
)

INDEX_HTML = """<!DOCTYPE html>
<html><head><title>stablediffusion-tpu</title>
<style>
 body {{ font-family: sans-serif; margin: 2em; background: #101418; color: #e8e8e8; }}
 fieldset {{ border: 1px solid #333; margin-bottom: 1em; }}
 label {{ display: inline-block; min-width: 11em; margin: 0.2em 0; }}
 input, select, textarea {{ background: #1c2228; color: #e8e8e8; border: 1px solid #444; }}
 textarea {{ width: 40em; }}
 #gallery img {{ max-width: 320px; margin: 4px; border: 1px solid #333; }}
 button {{ padding: 0.5em 2em; font-size: 1.1em; }}
 #status {{ color: #8fc7ff; margin-left: 1em; }}
</style></head>
<body>
<h2>stablediffusion-tpu</h2>
<fieldset><legend>Model</legend>
 <label>Type</label>
 <select id="model_type"><option>sd15</option><option selected>sdxl</option><option>sd3</option></select><br>
 <label>Checkpoint</label><input id="model_name" placeholder="(loaded model)"><br>
 <label>LoRAs (name:weight,..)</label><input id="loras" placeholder="style:0.7,detail:0.5"><br>
 <label>Textual inversions (path[:token],..)</label><input id="ti" placeholder="embeds/thing.pt:mytoken"><br>
 <label>Scheduler</label><select id="scheduler">{sched_options}</select>
</fieldset>
<fieldset><legend>Task</legend>
 <label><input type="radio" name="task" value="txt2img" checked> Text-To-Image</label>
 <label><input type="radio" name="task" value="img2img"> Image-To-Image</label>
 <label><input type="radio" name="task" value="inpaint"> Inpainting</label><br>
 <label>Init image</label><input type="file" id="image"><br>
 <label>Mask image</label><input type="file" id="mask_image"><br>
 <label>Strength</label><input type="range" id="strength" min="0" max="1" step="0.05" value="0.7">
</fieldset>
<fieldset><legend>Parameters</legend>
 <label>Prompt</label><textarea id="prompt" rows="2"></textarea><br>
 <label>Negative prompt</label><textarea id="negative_prompt" rows="1"></textarea><br>
 <label>Steps</label><input type="number" id="steps" value="30" min="1" max="100">
 <label>CFG</label><input type="number" id="cfg" value="7" min="0" max="15" step="0.5"><br>
 <label>Clip skip</label><input type="number" id="clip_skip" value="0" min="0" max="4">
 <label>Seed (-1 random)</label><input type="number" id="seed" value="-1"><br>
 <label>Width</label><input type="number" id="width" value="1024" step="64" min="256" max="2048">
 <label>Height</label><input type="number" id="height" value="1024" step="64" min="256" max="2048"><br>
 <label>Images per prompt</label><input type="number" id="nimg" value="1" min="1" max="16">
 <label><input type="checkbox" id="vae_tiling"> Tiled VAE (2048²+)</label>
 <label><input type="checkbox" id="prompt_weighting"> (word:1.2) weighting</label><br>
 <label>Hires fix scale (0=off)</label><input type="number" id="hires_scale" value="0" min="0" max="4" step="0.25">
 <label>Hires strength</label><input type="range" id="hires_strength" min="0" max="1" step="0.05" value="0.7">
</fieldset>
<button onclick="generate()">Generate</button><span id="status"></span>
<div id="gallery"></div>
<fieldset><legend>Train LoRA</legend>
 <label>Data dir (on server)</label><input id="train_data_dir" placeholder="/data/my-style"><br>
 <label>Rank</label><input type="number" id="train_rank" value="16" min="1" max="128">
 <label>Steps</label><input type="number" id="train_steps" value="500" min="1"><br>
 <label>Resolution</label><input type="number" id="train_res" value="512" step="64">
 <label>Output dir</label><input id="train_out" value="lora-out"><br>
 <button onclick="train()">Train</button><span id="train_status"></span>
</fieldset>
<script>
async function fileToB64(input) {{
  const f = input.files[0];
  if (!f) return null;
  const buf = await f.arrayBuffer();
  let s = ""; new Uint8Array(buf).forEach(b => s += String.fromCharCode(b));
  return btoa(s);
}}
async function generate() {{
  const g = id => document.getElementById(id);
  const task = document.querySelector('input[name=task]:checked').value;
  const input = {{
    prompt: g('prompt').value,
    negative_prompt: g('negative_prompt').value || null,
    num_inference_steps: +g('steps').value,
    guidance_scale: +g('cfg').value,
    clip_skip: +g('clip_skip').value || null,
    height: +g('height').value, width: +g('width').value,
    num_images_per_prompt: +g('nimg').value,
  }};
  if (+g('seed').value >= 0) input.seed = +g('seed').value;
  if (g('vae_tiling').checked) input.vae_tiling = true;
  if (g('prompt_weighting').checked) input.prompt_weighting = true;
  if (+g('hires_scale').value > 1) {{
    input.hires_scale = +g('hires_scale').value;
    input.hires_strength = +g('hires_strength').value;
  }}
  const model = {{}};
  if (g('model_name').value) {{
    model.type = g('model_type').value; model.name = g('model_name').value;
  }}
  if (g('scheduler').value) model.scheduler = g('scheduler').value;
  if (g('loras').value) {{
    model.loras = {{}};
    g('loras').value.split(',').forEach(p => {{
      const [n, w] = p.split(':'); model.loras[n.trim()] = +(w || 1);
    }});
  }}
  if (g('ti').value) {{
    model.textual_inversion = g('ti').value.split(',').map(p => {{
      const i = p.lastIndexOf(':');
      return i > 1 ? {{path: p.slice(0, i).trim(), token: p.slice(i + 1).trim()}}
                   : {{path: p.trim()}};
    }});
  }}
  if (Object.keys(model).length) input.model = model;
  if (task !== 'txt2img') {{
    input.image = await fileToB64(g('image'));
    input.strength = +g('strength').value;
  }}
  if (task === 'inpaint') input.mask_image = await fileToB64(g('mask_image'));
  g('status').textContent = 'generating...';
  const t0 = Date.now();
  const resp = await fetch('/', {{method: 'POST',
    body: JSON.stringify({{id: 'ui', input}})}});
  const data = await resp.json();
  if (data.error) {{ g('status').textContent = 'error: ' + data.error; return; }}
  g('status').textContent =
    `seed ${{data.seed}} · ${{((Date.now()-t0)/1000).toFixed(1)}}s`;
  const gal = document.getElementById('gallery'); gal.innerHTML = '';
  data.images.forEach(b64 => {{
    const img = document.createElement('img');
    img.src = 'data:image/jpeg;base64,' + b64; gal.appendChild(img);
  }});
}}
async function train() {{
  const g = id => document.getElementById(id);
  if (!g('train_data_dir').value) {{ g('train_status').textContent = 'data dir required'; return; }}
  g('train_status').textContent = 'training...';
  const resp = await fetch('/', {{method: 'POST', body: JSON.stringify({{id: 'ui-train',
    input: {{mode: 'train', train: {{
      data_dir: g('train_data_dir').value,
      rank: +g('train_rank').value,
      max_train_steps: +g('train_steps').value,
      resolution: +g('train_res').value,
      output_dir: g('train_out').value,
    }}}}}})}});
  const data = await resp.json();
  g('train_status').textContent = data.error ? ('error: ' + data.error)
    : ('done: ' + data.lora_path);
}}
</script>
</body></html>
"""


def index_html() -> str:
    return INDEX_HTML.format(sched_options=_SCHED_OPTIONS)


def launch_gradio(handler, port: int = 7860):  # pragma: no cover - optional dep
    """Native Gradio front-end when the package is installed."""
    import gradio as gr

    def generate(prompt, negative, steps, cfg, seed, width, height, scheduler):
        resp = handler(
            {
                "prompt": prompt,
                "negative_prompt": negative or None,
                "num_inference_steps": int(steps),
                "guidance_scale": float(cfg),
                "seed": None if seed < 0 else int(seed),
                "width": int(width),
                "height": int(height),
                "model": {"scheduler": scheduler},
            }
        )
        if "error" in resp:
            raise gr.Error(resp["error"])
        import base64
        import io

        from PIL import Image

        return [
            Image.open(io.BytesIO(base64.b64decode(b))) for b in resp["images"]
        ]

    demo = gr.Interface(
        fn=generate,
        inputs=[
            gr.Textbox(label="Prompt"),
            gr.Textbox(label="Negative prompt"),
            gr.Slider(1, 100, 30, label="Steps"),
            gr.Slider(0, 15, 7, label="CFG"),
            gr.Number(-1, label="Seed"),
            gr.Slider(256, 2048, 1024, step=64, label="Width"),
            gr.Slider(256, 2048, 1024, step=64, label="Height"),
            gr.Dropdown([n for n in SCHEDULER_NAMES if n != "DDPM"],
                        value="DPM++ 2M Karras", label="Scheduler"),
        ],
        outputs=gr.Gallery(label="Images"),
        title="stablediffusion-tpu",
    )
    demo.launch(server_port=port)
