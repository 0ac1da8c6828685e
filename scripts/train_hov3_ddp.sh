#! /bin/bash
# HO3Dv3 training (reference scripts/train_hov3_ddp.sh contract).
# On TPU one JAX process drives all local chips — there is no
# torch.distributed.launch; data parallelism is a sharded device mesh
# inside train.py. All hyperparameters match the reference script.

# basic configs (gpu_ids kept for script compatibility; devices come from
# the JAX runtime)
gpu_ids=0,1,2,3,4,5,6,7

# dataset configs
dataset_mode=hov3
data_dir=${DATA_DIR:-/mnt/blob/data/HO3D_v3_mask}
params_dir=params
images_dir=images

# saving configs
checkpoints_dir=checkpoints
name=exp_hov3_cropped_sr_resplit

# model configs
model=trainer
gen_name=generator_spade_attn
image_size=256

# training configs
load_path="None"
# per-chip batch. The recommended TPU deployment is batch_size=8 on a
# 4-chip mesh: 4 x 8 = the reference's global batch 32 exactly
# (8 GPUs x 4, reference train_hov3_ddp.sh:31,52) at ~0.71x the
# per-image step cost of b4 (measured 29.1% vs 21.4% MFU, PERF.md).
# An 8-chip mesh reproduces the reference layout exactly with
# BATCH_SIZE=4. Both legs are benchmarked honestly in BENCH_DETAILS.json
# (train_bf16 = b4, train_bf16_b8 = b8).
batch_size=${BATCH_SIZE:-8}
lambda_rec=10.0
lambda_tsf=10.0
lambda_mask=1.0
lambda_mask_smooth=1.0
nepochs_no_decay=15
nepochs_decay=15

python train.py \
        --gpu_ids                 ${gpu_ids}           \
        --data_dir                ${data_dir}          \
        --params_dir              ${params_dir}        \
        --images_dir              ${images_dir}        \
        --checkpoints_dir         ${checkpoints_dir}   \
        --load_path               ${load_path}         \
        --model                   ${model}             \
        --gen_name                ${gen_name}          \
        --name                    ${name}              \
        --dataset_mode            ${dataset_mode}      \
        --image_size              ${image_size}        \
        --batch_size              ${batch_size}        \
        --lambda_tsf              ${lambda_tsf}        \
        --lambda_rec              ${lambda_rec}        \
        --lambda_mask             ${lambda_mask}       \
        --lambda_mask_smooth      ${lambda_mask_smooth}\
        --nepochs_no_decay        ${nepochs_no_decay}  \
        --nepochs_decay           ${nepochs_decay}     \
        --num_repeats             20                   \
        --vgg_weights            ${vgg_weights:-assets/weights/vgg19.npz} \
        --mask_bce --use_vgg --use_spade
