from arec.data.schema import AttrField, EntitySchema, AttributeData, PAD_SENTINEL
from arec.data.dataset import PreparedDataset
