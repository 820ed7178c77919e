"""Per-task MasterLoss assembly from an HParams config.

Parity target: the loss factories in
/root/reference/dlib/process/instantiators.py (get_loss_std_cl :58,
get_loss_fcam :74, get_loss_tcam :147): each flag adds its elementary loss
with its lambda, epoch window, sigmas and ELB wiring.
"""
from __future__ import annotations

from tcam_wsol_video_tpu.core import constants
from tcam_wsol_video_tpu.losses import fcam as fcam_losses
from tcam_wsol_video_tpu.losses import tcam as tcam_losses
from tcam_wsol_video_tpu.losses.core import MasterLoss
from tcam_wsol_video_tpu.losses.std import ClLoss


def get_loss(args) -> MasterLoss:
    task = args.task
    if task == constants.STD_CL:
        return get_loss_std_cl(args)
    if task == constants.F_CL:
        return get_loss_fcam(args)
    if task == constants.TCAM:
        return get_loss_tcam(args)
    if task == constants.C_BOX:
        from tcam_wsol_video_tpu.losses.cbox import get_loss_cbox
        return get_loss_cbox(args)
    raise NotImplementedError(task)


def _common(args) -> dict:
    return dict(support_background=args.support_background,
                multi_label_flag=args.multi_label_flag,
                seg_ignore_idx=args.seg_ignore_idx)


def get_loss_std_cl(args) -> MasterLoss:
    ml = MasterLoss()
    ml.add(ClLoss(lambda_=1.0, **_common(args)))
    return ml


def get_loss_fcam(args) -> MasterLoss:
    ml = MasterLoss()
    c = _common(args)
    if args.im_rec:
        ml.add(fcam_losses.ImgReconstruction(
            lambda_=args.im_rec_lambda, use_elb=args.im_rec_elb, **c))
    if args.sl_fc:
        ml.add(fcam_losses.SelfLearningFcams(
            lambda_=args.sl_fc_lambda, start_ep=args.sl_start_ep,
            end_ep=args.sl_end_ep, **c))
    if args.crf_fc:
        ml.add(fcam_losses.ConRanFieldFcams(
            lambda_=args.crf_lambda, sigma_rgb=args.crf_sigma_rgb,
            sigma_xy=args.crf_sigma_xy, scale_factor=args.crf_scale,
            impl=args.crf_impl, n_landmarks=args.crf_n_landmarks,
            rff_freqs=args.crf_rff_freqs,
            start_ep=args.crf_start_ep, end_ep=args.crf_end_ep, **c))
    if args.entropy_fc:
        ml.add(fcam_losses.EntropyFcams(
            lambda_=args.entropy_fc_lambda, **c))
    if args.max_sizepos_fc:
        ml.add(fcam_losses.MaxSizePositiveFcams(
            lambda_=args.max_sizepos_fc_lambda,
            start_ep=args.max_sizepos_fc_start_ep,
            end_ep=args.max_sizepos_fc_end_ep, **c))
    assert ml.losses, "F_CL training requires at least one loss flag"
    return ml


def get_loss_tcam(args) -> MasterLoss:
    ml = MasterLoss()
    c = _common(args)
    if args.im_rec:
        ml.add(fcam_losses.ImgReconstruction(
            lambda_=args.im_rec_lambda, use_elb=args.im_rec_elb, **c))
    if args.sl_tc:
        ml.add(tcam_losses.SelfLearningTcams(
            lambda_=args.sl_tc_lambda, start_ep=args.sl_tc_start_ep,
            end_ep=args.sl_tc_end_ep, **c))
    if args.crf_tc:
        ml.add(tcam_losses.ConRanFieldTcams(
            lambda_=args.crf_tc_lambda, sigma_rgb=args.crf_tc_sigma_rgb,
            sigma_xy=args.crf_tc_sigma_xy, scale_factor=args.crf_tc_scale,
            impl=args.crf_impl, n_landmarks=args.crf_n_landmarks,
            rff_freqs=args.crf_rff_freqs,
            start_ep=args.crf_tc_start_ep, end_ep=args.crf_tc_end_ep, **c))
    if args.rgb_jcrf_tc:
        assert args.knn_tc > 0, \
            "temporal joint CRF needs clip sampling (knn_tc > 0)"
        ml.add(tcam_losses.RgbJointConRanFieldTcams(
            clip_len=2 * args.knn_tc + 1,
            lambda_=args.rgb_jcrf_tc_lambda,
            sigma_rgb=args.rgb_jcrf_tc_sigma_rgb,
            scale_factor=args.rgb_jcrf_tc_scale,
            impl=args.crf_impl, n_landmarks=args.crf_n_landmarks,
            rff_freqs=args.crf_rff_freqs,
            start_ep=args.rgb_jcrf_tc_start_ep,
            end_ep=args.rgb_jcrf_tc_end_ep, **c))
    if args.max_sizepos_tc:
        ml.add(tcam_losses.MaxSizePositiveTcams(
            lambda_=args.max_sizepos_tc_lambda,
            start_ep=args.max_sizepos_tc_start_ep,
            end_ep=args.max_sizepos_tc_end_ep, **c))
    if args.size_bg_g_fg_tc:
        ml.add(tcam_losses.BgSizeGreatSizeFgTcams(
            lambda_=args.size_bg_g_fg_tc_lambda,
            start_ep=args.size_bg_g_fg_tc_start_ep,
            end_ep=args.size_bg_g_fg_tc_end_ep, **c))
    if args.sizefg_tmp_tc:
        ml.add(tcam_losses.FgSizeTcams(
            eps=args.sizefg_tmp_tc_eps, lambda_=args.sizefg_tmp_tc_lambda,
            start_ep=args.sizefg_tmp_tc_start_ep,
            end_ep=args.sizefg_tmp_tc_end_ep, **c))
    if args.empty_out_bb_tc:
        ml.add(tcam_losses.EmptyOutsideBboxTcams(
            lambda_=args.empty_out_bb_tc_lambda,
            start_ep=args.empty_out_bb_tc_start_ep,
            end_ep=args.empty_out_bb_tc_end_ep, **c))
    assert ml.losses, "TCAM training requires at least one loss flag"
    return ml
