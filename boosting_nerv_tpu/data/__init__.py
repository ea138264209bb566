from .video import VideoData, data_split, make_inpaint_mask, synthetic_video
