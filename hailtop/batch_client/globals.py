ROOT_JOB_GROUP_ID = 0

MAX_JOB_GROUPS_DEPTH = 2

tasks = ('input', 'main', 'output')

complete_states = ('Cancelled', 'Error', 'Failed', 'Success')
