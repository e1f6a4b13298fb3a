from .slam_sequences import (SLAMImagesOnly, SLAMReplica, SLAMScanNet,
                             SLAMSevenScenes, SLAMTUMRGBD)

__all__ = ["SLAMImagesOnly", "SLAMTUMRGBD", "SLAMSevenScenes", "SLAMReplica",
           "SLAMScanNet"]
