# Shared dataset -> config/checkpoint resolution for the experiment grids
# (equivalent of the per-script blocks in the reference quick_start/*.sh).
DATASET="$1"
if [ "${DATASET}" = "ffhq" ]; then
    CONFIG="configs/test_ffhq.json"
    CHECKPOINT="${CHECKPOINT:-../model_zoo/diffusion_ffhq_10m.pt}"
elif [ "${DATASET}" = "imagenet" ]; then
    CONFIG="configs/test_imagenet.json"
    CHECKPOINT="${CHECKPOINT:-../model_zoo/256x256_diffusion_uncond.pt}"
else
    echo "Invalid dataset." && exit 1
fi
SAMPLE="python -m kdip_tpu.cli.sample_condition"
OPS="inpainting_config gaussian_deblur_config motion_deblur_config super_resolution_4x_config"
opname () {  # logdir segment per operator config
    case "$1" in
        inpainting_config) echo inpaint;;
        gaussian_deblur_config) echo gaussian_deblur;;
        motion_deblur_config) echo motion_deblur;;
        super_resolution_4x_config) echo super_resolution;;
    esac
}
