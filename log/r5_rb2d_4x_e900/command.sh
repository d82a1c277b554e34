cd /root/repo
python experiments/rb2d/train.py --data_folder data \
  --train_data rb2d_ra1e6_s42.npz,rb2d_ra1e6_s100.npz,rb2d_ra1e6_s101.npz,rb2d_ra1e6_s102.npz \
  --val_data rb2d_ra1e6_s7.npz \
  --nt 16 --nz 128 --nx 128 --downsamp_t 4 --downsamp_xz 8 \
  --lat_dims 64 --unet_nf 32 --imnet_nf 64 --n_samp_pts_per_crop 1024 \
  --batch_size_per_gpu 8 --inner_steps 8 --pseudo_epoch_size 2048 \
  --alpha_pde 0.1 --lr 5e-3 --lr_schedule cosine --pde_loss_type huber \
  --epochs 900 --seed 42 --log_dir log/r5_rb2d_4x_e900
