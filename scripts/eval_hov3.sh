#! /bin/bash
# HO3Dv3 evaluation (reference scripts/eval_hov3.sh contract, including the
# --eval_pairs flag the reference never defines — our options layer
# accepts-and-ignores it; eval.py hardcodes pairs_dir like the reference).

gpu_ids=7

dataset_mode=hov3
data_dir=${DATA_DIR:-/mnt/blob/data/HO3D_v3_mask}
params_dir=params
images_dir=images

model=trainer
gen_name=generator_spade_attn
load_path=checkpoints/net_epoch_30_id_G.ckpt
output_dir=results/exp_hov3_cropped_neural
eval_pairs=assets/eval_pairs.pkl

python3 eval.py         --gpu_ids       ${gpu_ids}          \
                        --gen_name      ${gen_name}         \
                        --model         ${model}            \
                        --data_dir      ${data_dir}         \
                        --params_dir    ${params_dir}       \
                        --images_dir    ${images_dir}       \
                        --dataset_mode  ${dataset_mode}     \
                        --load_path     ${load_path}        \
                        --output_dir    ${output_dir}       \
                        --eval_pairs    ${eval_pairs}       \
                        --batch_size    4                   \
                        --save_res      --use_spade
