#! /bin/bash
# DexYCB training (reference HOIG_DexYCB/scripts/train_ycb_ddp.sh contract).
# final_lr 5e-5 is the DexYCB variant's option default
# (HOIG_DexYCB/options/train_options.py:23), passed explicitly since this
# framework has one codebase for both datasets.

gpu_ids=0,1,2,3,4,5,6,7

dataset_mode=ycb
data_dir=${DATA_DIR:-/mnt/blob/data/DexYCB}
params_dir=params
images_dir=images

checkpoints_dir=checkpoints
name=exp_ycb

model=trainer
gen_name=generator_spade_attn
image_size=256

load_path="None"
batch_size=4
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
        --num_repeats             10                   \
        --final_lr                0.00005              \
        --vgg_weights            ${vgg_weights:-assets/weights/vgg19.npz} \
        --mask_bce --use_vgg --use_spade
