# Container image for TPU training/serving jobs (counterpart of the
# reference Dockerfile, rebuilt for the JAX TPU runtime instead of
# pytorch+CUDA).  Used as $IMAGE by scripts/k8s/tpu_job_template.yaml.
FROM python:3.11-slim

ENV PYTHONUNBUFFERED=1 \
    # persistent XLA compilation cache lives on the mounted volume
    JAX_COMPILATION_CACHE_DIR=/data/xla_cache

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make git && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app

# jax[tpu] pulls libtpu via the Google releases index
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    pip install --no-cache-dir flax optax orbax-checkpoint chex einops numpy pyyaml

COPY pyproject.toml README.md ./
COPY bio_diffusion_tpu ./bio_diffusion_tpu
COPY configs ./configs
COPY native ./native
COPY scripts ./scripts

# native data-loading components + editable install (console scripts)
RUN make -C native && pip install --no-cache-dir -e .

# train:  bdtpu-train experiment=qm9_mol_gen_ddpm
# serve:  bdtpu-serve ckpt_path=/data/ckpt port=8080
ENTRYPOINT ["bdtpu-train"]
