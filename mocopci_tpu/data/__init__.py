from mocopci_tpu.data.dhb import DHBDataset
from mocopci_tpu.data.nldrive import NLDriveDataset, batches
from mocopci_tpu.data.synthetic import SyntheticInterpolationDataset
